"""Voronoi-graph exploration planner (host CPU: numpy / OpenCV / scipy /
networkx — same algorithmic substrate as the reference's src/planner)."""
