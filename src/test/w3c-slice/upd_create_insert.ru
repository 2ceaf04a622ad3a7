PREFIX : <http://example.org/>
CREATE GRAPH :g9 ;
INSERT DATA { GRAPH :g9 { :a :p 1 } }
