PREFIX : <http://example.org/>
INSERT { :r :got ?o . :r :saw ?g }
WHERE { { :s :p ?o } UNION { GRAPH ?g { :s :p ?x } } }
