LOAD <file://src/test/w3c-slice/upd_load_doc.nt> INTO GRAPH <http://example.org/gl>
