"""Rollup layer: block production circuits and data model (reference
``src/rollup/``)."""
