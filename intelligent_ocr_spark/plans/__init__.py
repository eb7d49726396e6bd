"""Plans: end-to-end extraction job with checkpoint/resume + lineage."""
