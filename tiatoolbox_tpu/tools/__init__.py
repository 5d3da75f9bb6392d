"""Image-analysis tools: stains, masking, patch extraction, pyramids."""
