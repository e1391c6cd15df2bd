"""Relational pipeline stages (NER, pairing, RE, triples, linking, eval,
dedup, similarity)."""
