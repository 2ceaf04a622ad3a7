PREFIX : <http://example.org/>
INSERT { ?s :ref _:n . _:n :val ?o } WHERE { ?s :src ?o }
