PREFIX : <http://example.org/>
CLEAR DEFAULT ;
DROP GRAPH :g1
