"""Ingestion-edge sources and sinks (SURVEY §2.1).

The reference's external API edges (Places, CSE, Overpass, RSS) are
replaced by file fixtures in the engine; what remains engine-side is
the file-format surface: JSONL audit sinks (S9), GeoJSON feature
ingestion (S7/S8), and the TTL-keyed API response cache (S14).
"""
