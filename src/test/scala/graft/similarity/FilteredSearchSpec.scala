package graft.similarity

import graft.SparkSpec

/** The pre/post filtering comparison must actually exhibit the pitfall
  * it quantifies: pre-filtering always fills k from the eligible set,
  * and at least one query's post-filtered top-k comes back short. */
class FilteredSearchSpec extends SparkSpec {

  test("pre-filter fills k; post-filter shows a deficit somewhere") {
    val rows = Similarity.prePostFilter(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(_._1 == 3L), "pre-filter must always return k")
    assert(rows.forall { case (pre, post, d) => d == pre - post && post <= pre })
    assert(rows.exists(_._3 > 0L),
      "ineligible vectors must crowd at least one unfiltered top-k")
  }
}
