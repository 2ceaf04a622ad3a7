PREFIX : <http://example.org/>
BASE <http://base.example.org/>
CREATE SILENT GRAPH :g ;
INSERT DATA { :a :p 1 . GRAPH :g { :a :q _:b } } ;
DELETE DATA { GRAPH :g { :a :q :r } } ;
DELETE WHERE { ?s :gone ?o . GRAPH ?g { ?s :also ?o } } ;
WITH :g DELETE { ?s :p ?o } INSERT { ?s :q ?o . ?s :r _:n }
  USING :g USING NAMED :h WHERE { ?s :p ?o . OPTIONAL { ?s :x ?y } } ;
LOAD SILENT <file:///nonexistent.nt> INTO GRAPH :g ;
CLEAR SILENT NAMED ;
DROP SILENT ALL ;
ADD SILENT DEFAULT TO GRAPH :g ;
MOVE SILENT GRAPH :g TO DEFAULT ;
COPY SILENT DEFAULT TO :g ;
