"""Placeholder — queries registered in later build phase."""
