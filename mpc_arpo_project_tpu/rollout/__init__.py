"""Closed-loop rollouts: the reference's Python simulation loops as lax.scan programs."""
