PREFIX : <http://example.org/>
INSERT { :r :got ?o . :r :saw ?g }
USING <http://example.org/g1>
USING NAMED <http://example.org/g2>
WHERE { { :s :p ?o } UNION { GRAPH ?g { :s :p ?x } } }
