PREFIX : <http://example.org/>
INSERT { GRAPH ?g { ?s :tagged true } }
WHERE { ?s :p ?o OPTIONAL { ?s :home ?g } }
