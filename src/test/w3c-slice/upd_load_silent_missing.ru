LOAD SILENT <file://src/test/w3c-slice/definitely_not_here.nt>
