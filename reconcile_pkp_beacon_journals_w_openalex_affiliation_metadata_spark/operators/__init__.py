"""Operator layer: extract, blocking, pairs, scoring, clustering, stats."""
