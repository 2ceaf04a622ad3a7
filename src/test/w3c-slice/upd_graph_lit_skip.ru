PREFIX : <http://example.org/>
INSERT { GRAPH ?g { :mark :was :here } }
WHERE { ?s :p ?g }
