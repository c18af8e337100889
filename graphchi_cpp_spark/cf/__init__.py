"""Collaborative-filtering toolkit (reference toolkits/collaborative_filtering)."""
