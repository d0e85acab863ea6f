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
    // Waiver escape hatch (r8): a driver failure that has been
    // adjudicated AND fixed in-repo may be waived — but only by an entry
    // in data/correctness_waivers.json keyed by the EXACT correctness
    // file name and query, with a prose rationale naming the fix. A
    // waiver for any file other than the latest is stale and fails the
    // build (waivers must be cleaned up once the next driver round
    // confirms green). This keeps the loop closed — an unexplained
    // failure still breaks `sbt test` — without leaving the suite red
    // for a whole round after the fix has already landed (the r7→r8
    // x132 situation: judge-adjudicated hash-canonicalization drift,
    // output type re-emitted the same round).
    val files = Option(new java.io.File(".").listFiles()).get
      .filter(_.getName.matches("CORRECTNESS_r\\d+\\.json")).sortBy(_.getName)
    assert(files.nonEmpty, "no CORRECTNESS_r*.json committed yet")
    val latest = files.last
    val content = new String(
      java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8")
    // Failure DETECTION is a conservative whole-file scan (any literal
    // false or err key anywhere), so a `}` inside an arbitrary exception
    // string can never truncate a block and hide a later failure. The
    // per-block regex is used only to ATTRIBUTE failures to query names
    // and to classify them for the waiver gate; if the whole-file scan
    // fires but attribution finds nothing, that is itself a build failure.
    val fileHasFailure =
      content.contains("false") || """"err"\s*:\s*"""".r.findFirstIn(content).isDefined
    val block = """"([A-Za-z0-9_]+)"\s*:\s*\{([^}]*)\}""".r
    val blocks = block.findAllMatchIn(content).map(m => m.group(1) -> m.group(2)).toMap
    val failing = blocks.collect {
      case (name, body) if body.contains("false") ||
        """"err"\s*:\s*"""".r.findFirstIn(body).isDefined => name
    }.toSet
    assert(!fileHasFailure || failing.nonEmpty,
      s"${latest.getName} contains a failure marker the per-query scan could " +
        "not attribute to any query block (malformed/nested JSON?) — " +
        "treating as failed; inspect the file")
    // Waivers are restricted to HASH-ONLY mismatches: the recorded block
    // must say rows_match=true, schema_match=true, and carry no err. A
    // wrong-rows / wrong-schema / thrown failure can never be waived —
    // those are real correctness defects, not hasher canonicalization
    // drift. Policy (see data/correctness_waivers.json:_policy): a waiver
    // also requires prior independent judge adjudication.
    def hashOnly(body: String): Boolean =
      """"rows_match"\s*:\s*true""".r.findFirstIn(body).isDefined &&
        """"schema_match"\s*:\s*true""".r.findFirstIn(body).isDefined &&
        """"err"\s*:\s*"""".r.findFirstIn(body).isEmpty
    val waiverFile = new java.io.File("data/correctness_waivers.json")
    val waivers: Map[String, Set[String]] =
      if (!waiverFile.exists()) Map.empty
      else {
        val w = new String(
          java.nio.file.Files.readAllBytes(waiverFile.toPath), "UTF-8")
        val fileBlock = """"(CORRECTNESS_r\d+\.json)"\s*:\s*\{([^}]*)\}""".r
        val qKey = """"([A-Za-z0-9_]+)"\s*:""".r
        fileBlock.findAllMatchIn(w).map(m =>
          m.group(1) -> qKey.findAllMatchIn(m.group(2)).map(_.group(1)).toSet
        ).toMap
      }
    val stale = waivers.keySet - latest.getName
    assert(stale.isEmpty,
      s"stale correctness waivers for ${stale.toSeq.sorted} — the driver has " +
        "since produced a newer CORRECTNESS file; delete the resolved entries")
    val declared = waivers.getOrElse(latest.getName, Set.empty)
    val honorable = declared.filter(q => blocks.get(q).exists(hashOnly))
    val dishonored = (declared intersect failing) -- honorable
    assert(dishonored.isEmpty,
      s"waivers for ${dishonored.toSeq.sorted} are not honorable: only " +
        "hash-only mismatches (rows_match+schema_match true, no err) may be " +
        "waived — a rows/schema/thrown failure must be fixed, not waived")
    val unwaived = failing -- honorable
    assert(unwaived.isEmpty,
      s"${latest.getName} records unwaived failures: ${unwaived.toSeq.sorted} " +
        "(rows/schema/hash mismatch or thrown query; adjudicate + fix, then " +
        "waive in data/correctness_waivers.json)")
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

  test("preflight: no catalog query outputs a decimal wider than 18 digits") {
    // Round-7's only red row (x132) was a DECIMAL(38,0) output whose
    // values matched the oracle exactly yet hash-mismatched under the
    // driver's typed hash: wide decimals are the one output family where
    // a hasher's decimal canonicalization (scale padding, sign-of-zero,
    // BigDecimal vs int128 encodings) can diverge while every comparison
    // a human runs says "equal". ≤18 digits is the hash-safe band — it
    // round-trips exactly through int64/float64-free paths on both
    // engines. Anything wider must be re-emitted as scaled BIGINT or
    // 64-bit halves (pcaPowerProjection's pc1_hi/pc1_lo is the pattern).
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] &&
            f.dataType.asInstanceOf[DecimalType].precision > 18 =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        spark.catalog.clearCache()
        bad
    }
    assert(offenders.isEmpty,
      s"decimal outputs wider than the 18-digit hash-safe band:\n${offenders.mkString("\n")}")
  }
}
