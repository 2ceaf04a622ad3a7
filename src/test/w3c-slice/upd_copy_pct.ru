COPY GRAPH <http://example.org/g1> TO GRAPH <http://example.org/g%31>
