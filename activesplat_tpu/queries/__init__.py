"""Map queries: top-down occupancy/visibility and panoramic invisibility."""
