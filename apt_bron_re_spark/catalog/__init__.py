"""Node-catalog construction: synthetic layers, pattern dictionaries."""
