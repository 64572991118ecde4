"""Training engine (SURVEY L4): Trainer (C13), frame metrics (C15),
checkpointing (C18, §5.4)."""
