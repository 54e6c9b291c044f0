"""Sources: frame alignment, fixture encoder, replay source."""
