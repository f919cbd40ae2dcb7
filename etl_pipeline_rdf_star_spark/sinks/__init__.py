"""Sink-side serializers (RDF text interop)."""
