"""Persistent index state: segment files, term directory, manifests."""
