PREFIX : <http://example.org/>
WITH <http://example.org/gnew>
INSERT { :a :b :c }
WHERE {}
