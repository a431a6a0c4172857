package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.{FixedLayoutCodec, VariantRecord}

/** Round-trip law for the payload codec (the HBaseVariantEncoder
  * analog): decode(encode(r)) == r for arbitrary records, including
  * unicode strings, empty/missing fields, and extreme coordinates. */
object CodecProps extends Properties("codec") {

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.const(""),
    Gen.const("chrß-Ω≈ç"), // multi-byte UTF-8
    Gen.const(null: String))

  private val genRecord: Gen[VariantRecord] = for {
    sample <- genStr
    contig <- genStr
    start <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    end <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    kind <- Gen.oneOf("site", "block")
    nAlleles <- Gen.choose(0, 3)
    alleles <- Gen.listOfN(nAlleles,
      Gen.oneOf("A", "C", "G", "T", "<NON_REF>", "", null: String))
    gq <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
    gt <- genStr
  } yield VariantRecord(sample, contig, start, end, kind, alleles, gq, gt)

  property("decode(encode(r)) == r") = forAll(genRecord) { r =>
    FixedLayoutCodec.decode(FixedLayoutCodec.encode(r)) == r
  }
}

/** DataFrame-level codec plumbing against the synthetic cohort. */
class CodecSpec extends SparkSpec {

  test("DataFrame-level encode/decode round-trips the synthetic cohort") {
    import spark.implicits._
    val v = graft.ops.Gvcf.syntheticVariants(spark, 300)
    val back = FixedLayoutCodec.decodeDf(FixedLayoutCodec.encodeDf(v))
    val orig = v.select("sample", "contig", "start", "end", "kind", "alleles", "gq", "gt")
      .as[VariantRecord].collect().toSet
    val rt = back.select("sample", "contig", "start", "end", "kind", "alleles", "gq", "gt")
      .as[VariantRecord].collect().toSet
    assert(rt == orig)
  }

  test("payload_len matches the declared fixed layout size formula") {
    import spark.implicits._
    val enc = FixedLayoutCodec.encodeDf(graft.ops.Gvcf.syntheticVariants(spark, 30))
    val dec = FixedLayoutCodec.decodeDf(enc)
    val bad = dec.filter(
      $"payload_len" =!=
        (org.apache.spark.sql.functions.lit(29) +
          org.apache.spark.sql.functions.length($"sample") +
          org.apache.spark.sql.functions.length($"contig") +
          org.apache.spark.sql.functions.length($"gt") +
          org.apache.spark.sql.functions.aggregate($"alleles",
            org.apache.spark.sql.functions.lit(0),
            (acc, a) => acc + org.apache.spark.sql.functions.length(a) + 2)))
      .count()
    assert(bad == 0L)
  }
}
