PREFIX : <http://example.org/>
DELETE WHERE { ?s :type :Old . GRAPH :g1 { ?s :note ?n } }
