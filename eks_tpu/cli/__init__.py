"""Command-line interface for eks-tpu (subcommand per smoother family)."""
