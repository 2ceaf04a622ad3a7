PREFIX : <http://example.org/>
DELETE WHERE {
  ?x :p ?y .
  GRAPH :g1 { ?y :q ?z }
  GRAPH :g2 { ?z :r ?w }
}
