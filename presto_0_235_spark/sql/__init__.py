"""SQL front door (SURVEY.md §7 Phase 5)."""
