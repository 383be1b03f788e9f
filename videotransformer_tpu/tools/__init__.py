"""Tools: demo inference, attention visualization."""
