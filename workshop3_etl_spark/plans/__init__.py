"""Query registry + plan-inspection helpers."""
