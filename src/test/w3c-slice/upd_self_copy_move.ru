COPY GRAPH <http://example.org/g1> TO GRAPH <http://example.org/g1> ;
MOVE GRAPH <http://example.org/g1> TO GRAPH <http://example.org/g1>
