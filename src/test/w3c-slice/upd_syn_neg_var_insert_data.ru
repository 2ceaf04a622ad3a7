INSERT DATA { ?s <urn:p> 1 }
