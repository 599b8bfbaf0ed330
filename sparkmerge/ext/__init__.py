"""[EXT] LLM-data-pipeline operators (SURVEY.md §2.D; mandated by the build
contract's north star, no reference citations).

Design rules for 100 TB scale:
- native pyspark.sql.functions only in hot paths (JVM, whole-stage codegen);
  Arrow-batched pandas only where semantics require it (multimodal decode);
- every pairwise operator (dedup, similarity) goes through a CANDIDATE
  GENERATION stage (LSH buckets, banding, group keys) before any O(n²) work —
  brute force only within buckets or behind explicit small-side broadcast;
- shuffles are keyed on the bucket/band/group id so AQE can coalesce and
  split skew.
"""
