"""Source/sink layer: table readers and multimodal column plumbing."""
