"""Streaming + event-time operators over the ``events`` table."""
