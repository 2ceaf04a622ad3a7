PREFIX : <http://example.org/>
WITH :g2 DELETE { ?s :p ?o } INSERT { ?s :q ?o } WHERE { ?s :p ?o } ;
INSERT { GRAPH :g2 { ?s :copied ?o } } USING :g1 WHERE { ?s :p ?o }
