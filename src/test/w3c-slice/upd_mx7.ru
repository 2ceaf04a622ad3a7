PREFIX : <http://example.org/>
WITH <http://example.org/g1>
INSERT { :r :got ?o . :r :saw ?g }
USING NAMED <http://example.org/g2>
WHERE { { :s :p ?o } UNION { GRAPH ?g { :s :p ?x } } }
