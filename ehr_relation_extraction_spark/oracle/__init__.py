"""Correctness oracles: DuckDB SQL generators + pure-Python reference."""
