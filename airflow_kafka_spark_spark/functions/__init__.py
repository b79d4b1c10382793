"""Reusable column-level building blocks (pure ``Column`` / DataFrame fns)."""
