"""Workload declaration (driver contract), agent/fault-tolerance layer,
and plan-inspection utilities."""
