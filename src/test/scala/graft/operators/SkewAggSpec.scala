package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class SkewAggSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase agg equals direct groupBy") {
    // heavy skew: 90% of rows share one key
    val df = (1 to 2000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
      (k, i.toLong, i * 0.5)
    }.toDF("key", "n", "v")
    val salted = SkewAgg.saltedAgg(df, Seq("key"), salts = 8, Seq(
      SkewAgg.countAll("cnt"),
      SkewAgg.sumOf(col("n"), "sum_n"),
      SkewAgg.sumOf(col("v").cast(DecimalType(18, 4)), "sum_v"),
      SkewAgg.minOf(col("n"), "min_n"),
      SkewAgg.maxOf(col("n"), "max_n")))
    val direct = df.groupBy("key").agg(
      count(lit(1)).as("cnt"), sum("n").as("sum_n"),
      sum(col("v").cast(DecimalType(18, 4))).as("sum_v"),
      min("n").as("min_n"), max("n").as("max_n"))
    val s = salted.orderBy("key").collect().map(_.toSeq)
    val d = direct.orderBy("key").collect().map(_.toSeq)
    assert(s.toSeq == d.toSeq)
  }

  test("phase-1 spreads a hot key over multiple salt groups") {
    val df = Seq.fill(1000)(("hot", 1L)).toDF("key", "n").repartition(8)
    val phase1Groups = df
      .withColumn("_salt", pmod(spark_partition_id() +
        monotonically_increasing_id(), lit(8)))
      .groupBy("key", "_salt").count()
    assert(phase1Groups.count() > 1)
  }

  test("SQL functions registered via GraftExtensions") {
    val s = spark
    graft.GraftExtensions.register(s)
    val r = s.sql(
        """SELECT graft_simhash(graft_shingle_hashes('a b c d e', 3)) AS sh,
          |       size(graft_minhash(graft_shingle_hashes('a b c d e', 3), 32)) AS n,
          |       graft_rolling_fp('abc') AS fp,
          |       hex(graft_hb_encode(42L)) AS enc,
          |       graft_zorder(3L, 0L) AS z,
          |       graft_shingle_seq('a b a b', 2) AS seq,
          |       graft_tag_ttl(X'00090800000000000001F4') AS ttl
          |""".stripMargin).head()
      assert(r.getAs[Long]("sh") != 0L)
      assert(r.getAs[Int]("n") == 32)
      assert(r.getAs[Long]("fp") != 0L)
    assert(r.getAs[String]("enc") == "000000000000002A")
    assert(r.getAs[Long]("z") == 10L)
    // 3 bigram positions, ab == ab dup retained
    assert(r.getSeq[Long](r.fieldIndex("seq")).length == 3)
    assert(r.getAs[Long]("ttl") == 500L)
    // the sketch registers as a SQL AGGREGATE
    val hh = s.sql(
      """SELECT graft_freq_items(x, 4) AS sk
        |FROM VALUES (7L),(7L),(7L),(1L),(2L) AS t(x)""".stripMargin).head()
    val items = hh.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0))
    assert(items.contains(7L))
  }

  test("DESCRIBE FUNCTION shows usage text for graft_* functions") {
    graft.GraftExtensions.register(spark)
    val desc = spark.sql("DESCRIBE FUNCTION graft_minhash")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("MinHash signature"), desc)
  }
}
