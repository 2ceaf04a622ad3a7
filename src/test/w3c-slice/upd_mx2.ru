PREFIX : <http://example.org/>
WITH <http://example.org/g1>
INSERT { :r :got ?o . :r :saw ?g }
WHERE { { :s :p ?o } UNION { GRAPH ?g { :s :p ?x } } }
