"""Sources: corpus synthesis, graph derivation, reference-format parsing."""
