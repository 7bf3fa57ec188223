"""Console scripts (reference cli/ package, 7 commands)."""
