"""Configuration, units, I/O and logging utilities."""
