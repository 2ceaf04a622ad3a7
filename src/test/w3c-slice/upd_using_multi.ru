PREFIX : <http://example.org/>
INSERT { :r :got ?o }
USING <http://example.org/g1>
USING <http://example.org/g2>
WHERE { :s :p ?o }
