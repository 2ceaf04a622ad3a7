PREFIX : <http://example.org/>
INSERT { :r :got ?o . :r :saw ?g }
USING NAMED <http://example.org/g1>
WHERE { { :s :p ?o } UNION { GRAPH ?g { :s :p ?x } } }
