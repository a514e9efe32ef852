"""Problem domains (reference layer L5)."""
