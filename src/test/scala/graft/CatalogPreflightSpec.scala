package graft

/** Build-failing preflight over the full query catalog.
  *
  * Round-4 regression: a driver-side testdata schema change (events.ts
  * nanos-as-long → TIMESTAMP_MICROS) made 23 catalog queries throw
  * AnalysisException at plan time, and the failures were invisible because
  * Verify's catch block swallowed them. This spec resolves + optimizes every
  * declared query against sf0.001 so any schema/analysis drift fails
  * `sbt test` loudly, per-query, before the driver ever runs Verify.
  *
  * Analysis-only on purpose: executing all 150 queries takes ~7 min at
  * sf0.001 (that full-execution pass lives in `graft.Verify`, which now also
  * records errors.json); optimizedPlan covers the resolution/typing class of
  * drift in seconds per query. Queries whose builders do eager driver-side
  * work (threshold collects, iterative steps) execute that prefix anyway, so
  * coverage is strictly more than plan-time.
  */
class CatalogPreflightSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"preflight: $name analyzes against sf0.001") {
      val df = fn(spark, sfDir)
      // forces resolution + optimization; throws on any analysis drift
      assert(df.queryExecution.optimizedPlan != null)
      assert(df.schema.fields.nonEmpty)
      spark.catalog.clearCache()
    }
  }

  test("preflight: every query has either an oracle or a rows-only waiver") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only checks are allowed by the driver contract but we currently
    // declare an oracle for every query — keep it that way.
    assert(missing.isEmpty, s"queries without oracleSql: ${missing.toSeq.sorted}")
  }

  test("preflight: the last driver correctness round recorded zero failures") {
    // Full Verify runs exit 0 by driver contract even when errors.json is
    // non-empty (the driver keeps its own tally), so a silent driver-side
    // miss would otherwise surface nowhere build-failing. This closes the
    // loop: the NEXT `sbt test` fails if the latest committed
    // CORRECTNESS_r{N}.json contains any err / rows / schema / hash
    // failure. Dependency-free check: the driver file is flat
    // one-object-per-query JSON, so a conservative string scan suffices —
    // any `false` or non-null err anywhere in it is a failure.
    val files = Option(new java.io.File(".").listFiles()).get
      .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json")).sortBy(_.getName)
    assert(files.nonEmpty, "no CORRECTNESS_r*.json committed yet")
    val latest = files.last
    val content = new String(
      java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8")
    assert(!content.contains("false"),
      s"${latest.getName} records at least one rows/schema/hash mismatch")
    assert(!content.contains("\"err\": \"") && !content.contains("\"err\":\""),
      s"${latest.getName} records at least one thrown query")
  }

  test("preflight: no catalog query outputs a narrow numeric type") {
    // The driver's compare hashes TYPED values and DuckDB widens
    // aggressively (integer SUM → HUGEINT, least/greatest INTEGER →
    // BIGINT, float math → DOUBLE), so FloatType / ShortType / ByteType
    // in a query's OUTPUT schema is a standing hash-drift hazard even
    // when every value matches — the round-5 x95 failure class. Catalog
    // outputs stick to long/int/double/decimal and the non-numeric
    // types; this locks that convention at plan time, without DuckDB.
    import org.apache.spark.sql.types.{ByteType, FloatType, ShortType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).schema.fields.collect {
          case f if Set[Any](FloatType, ShortType, ByteType)(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        spark.catalog.clearCache()
        bad
    }
    assert(offenders.isEmpty,
      s"narrow numeric output types (oracle hash-drift hazard):\n${offenders.mkString("\n")}")
  }
}
