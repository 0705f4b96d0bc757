"""cityfinder_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine (NOT a port) with the query semantics of the reference
repo SamyRai/cityFinder (see /root/repo/SURVEY.md):

1. nearest-city kNN (k=1) lookup  -> distributed cell-indexed broadcast
   join (`operators.nearest`), replacing the reference's S2
   ShapeIndex + ClosestEdgeQuery (lib/finder/coordinates/s2.go:52-75).
2. city-by-name exact + fuzzy     -> exploded-name broadcast equi-join +
   levenshtein<=2 fallback (`operators.name_lookup`), replacing the
   inverted index + BK-tree (lib/finder/name/name.go:56-75).
3. city-by-postal-code            -> broadcast equi-join with
   last-write-wins build dedup (`operators.postal_lookup`), replacing
   the two-level hash map (lib/finder/postalCode/postalCode.go:58-73).

Plus the web-scale additions the north rule mandates: point-in-polygon
admin tiling, raster-tile->vector-cell mapping, skew salting + adaptive
cell splitting, checkpoint/lineage metadata tables, and a training-data
pipeline suite (dedup, similarity search, text analysis, multimodal
columns) over the driver's documents/embeddings tables.
"""

__version__ = "0.1.0"
