"""Composable DataFrame-in/DataFrame-out operators."""
