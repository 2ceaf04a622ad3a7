PREFIX : <http://example.org/>
INSERT DATA {
  :a :p 1 .
  GRAPH :g1 { :a :q "x" }
}
