"""DataFrame pipeline stages: parse -> enrich -> route -> aggregate."""
