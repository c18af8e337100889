"""Post-processing + training-data-pipeline operators."""
