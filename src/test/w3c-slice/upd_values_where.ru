PREFIX : <http://example.org/>
INSERT { ?s :tagged true } WHERE { VALUES ?s { :a :c } ?s :p ?o }
