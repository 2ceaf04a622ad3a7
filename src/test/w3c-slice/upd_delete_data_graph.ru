PREFIX : <http://example.org/>
DELETE DATA { :d0 :d0 :d0 . GRAPH <http://example.org/g1> { :a :b :c } }
