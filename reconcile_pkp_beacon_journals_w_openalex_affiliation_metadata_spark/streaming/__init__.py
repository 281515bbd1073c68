"""Incremental / streaming execution mode."""
