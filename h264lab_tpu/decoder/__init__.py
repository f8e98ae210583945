"""Independent numpy H.264 baseline decoder used as test infrastructure."""
