PREFIX : <http://example.org/>
INSERT DATA { :a :p :b } ;
DELETE { ?s :p ?o } INSERT { ?s :q ?o } WHERE { ?s :p ?o }
