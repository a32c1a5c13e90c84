"""Source / sink wrappers (operators S1-S10)."""
