"""Superseded kernel experiments — see README.md.  Not a production path."""
