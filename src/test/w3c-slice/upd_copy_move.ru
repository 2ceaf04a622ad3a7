PREFIX : <http://example.org/>
COPY :g1 TO :g2 ;
MOVE :g1 TO :g3
