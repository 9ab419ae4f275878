"""Smoother model families: one module per camera/dataset geometry."""
