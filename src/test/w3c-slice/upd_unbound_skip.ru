PREFIX : <http://example.org/>
DELETE { ?s :p ?n } WHERE { ?s :p ?o . OPTIONAL { ?s :name ?n } }
