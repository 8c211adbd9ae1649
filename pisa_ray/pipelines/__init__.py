"""Pipeline operator library: relational ops (the reference's
map/filter/join/aggregate/top-k surface re-expressed on Ray Data),
plus the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing)."""
