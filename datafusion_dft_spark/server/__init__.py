"""Server frontends (HTTP)."""
