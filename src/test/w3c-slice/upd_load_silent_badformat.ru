LOAD SILENT <file://src/test/w3c-slice/upd_load_bad.nt>
