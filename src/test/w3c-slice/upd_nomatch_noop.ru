PREFIX : <http://example.org/>
INSERT { :a :b :c } WHERE { :nope :never :matches }
