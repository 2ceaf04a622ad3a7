PREFIX : <http://example.org/>
WITH <http://example.org/g1>
INSERT DATA { :a :b :c }
