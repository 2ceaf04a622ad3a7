PREFIX : <http://example.org/>
INSERT { ?s :p/:q ?o } WHERE { ?s :x ?o }
