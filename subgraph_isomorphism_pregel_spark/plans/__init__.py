"""Query planning: sketch-tree matching order for the subgraph matcher."""
