LOAD <file:///tmp/x.nt> INTO <http://example.org/g1>
