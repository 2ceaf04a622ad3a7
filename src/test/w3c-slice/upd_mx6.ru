PREFIX : <http://example.org/>
WITH <http://example.org/g2>
INSERT { :r :got ?o . :r :saw ?g }
USING <http://example.org/g1>
WHERE { { :s :p ?o } UNION { GRAPH ?g { :s :p ?x } } }
