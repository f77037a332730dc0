"""Plot backend implementations."""
