"""Dataset readers and synthetic scene generation."""
