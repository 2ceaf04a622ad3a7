PREFIX : <http://example.org/>
DELETE { ?s :old ?o } INSERT { ?s :new ?o } WHERE { ?s :old ?o }
