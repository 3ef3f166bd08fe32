"""North-rule operator extensions over the same engine: spatial joins
(quad-cell index, PIP, kNN, raster overlay) and large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing). SURVEY.md §2.4 + build-brief extensions."""
