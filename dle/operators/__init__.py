"""Engine operators (SURVEY.md §2 inventory).

Spatial overlay core:  spatial_join, clip, dissolve, tile, overlapping,
precedence (insert_difference), planarize, raster.
Web-scale pipeline ops: dedup, similarity, textstats, asof.
"""
