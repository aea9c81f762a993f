package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.IntervalSet
import graft.sinks.SqlBuilder

/** Property-based checks (ScalaCheck) for the pure algebraic cores the
  * distributed operators lean on — the places where a subtle edge case
  * (adjacent intervals, zero-row batches, hostile identifiers) breaks
  * correctness silently rather than loudly.
  */
class PropertySpec extends AnyFunSuite {

  private def holds(label: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val gnoGen = Gen.chooseNum(1L, 200L)
  private val gnoSetGen = Gen.listOf(gnoGen).map(_.toSet)

  test("IntervalSet is a faithful set of longs under add/merge") {
    holds("membership") {
      Prop.forAll(gnoSetGen) { xs =>
        val ivs = xs.foldLeft(IntervalSet.empty)(_.add(_))
        (1L to 210L).forall(v => ivs.contains(v) == xs.contains(v)) &&
          ivs.count == xs.size.toLong
      }
    }
    holds("merge == set union") {
      Prop.forAll(gnoSetGen, gnoSetGen) { (a, b) =>
        val ia = a.foldLeft(IntervalSet.empty)(_.add(_))
        val ib = b.foldLeft(IntervalSet.empty)(_.add(_))
        val u = ia.merge(ib)
        u.count == (a ++ b).size.toLong &&
          (1L to 210L).forall(v => u.contains(v) == (a ++ b).contains(v))
      }
    }
    holds("merge commutes and is idempotent") {
      Prop.forAll(gnoSetGen, gnoSetGen) { (a, b) =>
        val ia = a.foldLeft(IntervalSet.empty)(_.add(_))
        val ib = b.foldLeft(IntervalSet.empty)(_.add(_))
        ia.merge(ib).render == ib.merge(ia).render &&
          ia.merge(ia).render == ia.render
      }
    }
  }

  test("IntervalSet intervals stay normalized: sorted, disjoint, non-adjacent") {
    holds("normal form") {
      Prop.forAll(gnoSetGen) { xs =>
        val ivs = xs.foldLeft(IntervalSet.empty)(_.add(_)).intervals
        ivs.forall { case (lo, hi) => lo <= hi } &&
          ivs.sliding(2).forall {
            case List((_, h1), (l2, _)) => l2 > h1 + 1 // gap, else they'd merge
            case _ => true
          }
      }
    }
  }

  test("subtract is set difference; render/parse round-trips") {
    holds("difference") {
      Prop.forAll(gnoSetGen, gnoSetGen) { (a, b) =>
        val ia = a.foldLeft(IntervalSet.empty)(_.add(_))
        val ib = b.foldLeft(IntervalSet.empty)(_.add(_))
        val d = ia.subtract(ib)
        (1L to 210L).forall(v => d.contains(v) == (a.contains(v) && !b.contains(v)))
      }
    }
    holds("roundtrip") {
      Prop.forAll(gnoSetGen.suchThat(_.nonEmpty)) { xs =>
        val ivs = xs.foldLeft(IntervalSet.empty)(_.add(_))
        IntervalSet.parse(ivs.render).render == ivs.render
      }
    }
  }

  test("DDL classify/rewrite are total on arbitrary input and identity under empty maps") {
    import graft.ddl.DdlRewriter
    val sqlish = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf(
        "CREATE TABLE `a b`.`weird``name` (x INT)",
        "ALTER TABLE x ADD COLUMN `c -- not a comment` INT",
        "DROP TABLE IF EXISTS `src`.`t1`; -- trailing",
        "TRUNCATE TABLE src.t1",
        "create   TABLE src.t2 (s VARCHAR(10) COLLATE utf8mb4_0900_ai_ci)",
        "/* lead */ RENAME TABLE a TO b",
        "'unterminated string",
        "`unterminated ident",
        // statement-shaped bare-name branches (round-5 rewriter surface)
        "DROP TABLE a, , b CASCADE", "DROP TABLE",
        "RENAME TABLE a TO", "RENAME TABLE TO b, x TO y TO z",
        "CREATE TABLE t LIKE", "ALTER TABLE t RENAME",
        "ALTER TABLE t RENAME TO", "ALTER TABLE t RENAME COLUMN a TO b",
        "CREATE UNIQUE INDEX i ON", "DROP INDEX ON t",
        "FLUSH TABLES , t2 WITH READ LOCK", "FLUSH TABLES t1,",
        "CREATE DATABASE IF NOT EXISTS", "ALTER SCHEMA `x"))
    // statement-prefixed garbage drives the per-kind regex paths
    val prefixed = for {
      p <- Gen.oneOf("DROP TABLE ", "RENAME TABLE ", "TRUNCATE ", "CREATE TABLE ",
        "ALTER TABLE ", "CREATE INDEX i ON ", "DROP INDEX i ON ", "FLUSH TABLES ",
        "CREATE DATABASE ", "ALTER DATABASE ")
      tail <- Gen.asciiPrintableStr
    } yield p + tail
    val anySql = Gen.oneOf(sqlish, prefixed)
    holds("classify total") {
      Prop.forAll(anySql) { s => DdlRewriter.classify(s) != null }
    }
    // rewrite canonicalizes qualified names to backticked form even with
    // empty maps, so identity is too strong — the contract is: total,
    // idempotent (canonical form is a fixpoint), and quote-safe
    // (unterminated quotes pass through without "repair")
    holds("rewrite total + idempotent") {
      Prop.forAll(sqlish) { s =>
        val once = DdlRewriter.rewrite(s, Map.empty, Map.empty)
        DdlRewriter.rewrite(once, Map.empty, Map.empty) == once
      }
    }
    holds("rewrite with maps + default schema is total on garbage") {
      Prop.forAll(anySql) { s =>
        DdlRewriter.rewrite(s, Map("a" -> "b"),
          Map(("a", "t") -> ("b", "t2")), defaultSchema = "a") != null
      }
    }
    holds("filterDropTables total; kept pairs never include skipped tables") {
      Prop.forAll(anySql) { s =>
        val (out, kept) = DdlRewriter.filterDropTables(s, "db",
          (sch, t) => sch == "skip" || t == "skip")
        out != null && kept.forall { case (sch, t) => sch != "skip" && t != "skip" }
      }
    }
    holds("unterminated quotes are not repaired") {
      Prop.forAll(Gen.oneOf("`", "`Y7", "'abc", "ALTER TABLE `x", "\"half")) { s =>
        DdlRewriter.rewrite(s, Map.empty, Map.empty) == s
      }
    }
  }

  test("redo-SQL parse is total: garbage and truncated DML never throw") {
    import graft.sources.RedoSqlParser
    val redoish = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf(
        "insert into", "insert into \"A\".\"B\"(", "insert into \"A\".\"B\"(\"X\") values",
        "insert into \"A\".\"B\"(\"X\") values (", "update \"A\".\"B\" set",
        "update \"A\".\"B\" set \"X\" = where", "delete from \"A\".\"B\" where \"X\" =",
        "insert into \"A\".\"B\"(\"X\") values ('unterminated)",
        "insert into \"A\".\"B\"(\"X\") values (TO_DATE('2021-01-01',)",
        "commit", "rollback", "insert insert insert"))
    holds("parse total") {
      Prop.forAll(redoish) { s =>
        scala.util.Try(RedoSqlParser.parse(s)).isSuccess
      }
    }
  }

  test("tierPlan covers every batch size exactly, largest tiers first") {
    holds("exact cover") {
      Prop.forAll(Gen.chooseNum(0, 5000)) { n =>
        val plan = SqlBuilder.tierPlan(n)
        val covered = plan.map { case (tier, cnt) => tier * cnt }.sum
        val tiersUsed = plan.map(_._1)
        covered == n &&
          tiersUsed == tiersUsed.sortBy(-_) && // descending
          plan.forall { case (_, cnt) => cnt > 0 } &&
          // greedy: after the plan, fewer statements than one-row-each
          plan.map(_._2).sum <= math.max(n, 1)
      }
    }
  }

  test("OracleDdlConverter is total: garbage returns Left, never throws") {
    import graft.ddl.OracleDdlConverter
    val oracleish = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf(
        "CREATE TABLE", "CREATE TABLE S.", "CREATE TABLE S.T(",
        "CREATE TABLE S.T(C)", "CREATE TABLE S.T(C NUMBER(",
        "CREATE TABLE S.T(C NUMBER(8", "CREATE TABLE S.T(C WIDGET)",
        "CREATE TABLE S.T(C VARCHAR2())", "CREATE TABLE S.T(C CHAR(-5))",
        """CREATE TABLE "unterminated(C INT)""",
        "ALTER TABLE", "ALTER TABLE S.T", "ALTER TABLE S.T ADD (",
        "ALTER TABLE S.T MODIFY C", "ALTER TABLE S.T DROP (A,",
        "ALTER TABLE S.T RENAME COLUMN A", "ALTER TABLE S.T ADD CONSTRAINT",
        "DROP TABLE", "DROP TABLE .", "drop table s.t cascade constraints",
        "-- only a comment", "commit", "GRANT SELECT ON T TO U",
        // size literal past Int.MaxValue: the lexer's toInt edge
        "CREATE TABLE S.T(C VARCHAR2(99999999999999999999))",
        "CREATE TABLE S.T(C NUMBER(999999999999, 3))"))
    val prefixed = for {
      p <- Gen.oneOf("CREATE TABLE ", "ALTER TABLE ", "DROP TABLE ",
        "CREATE TABLE S.T(C ", "ALTER TABLE S.T ADD (C ")
      tail <- Gen.asciiPrintableStr
    } yield p + tail
    holds("convert total") {
      Prop.forAll(Gen.oneOf(oracleish, prefixed)) { s =>
        OracleDdlConverter.convert(s, "SEG") // Left or Right — never throws
        true
      }
    }
  }

  test("image codecs round-trip ARBITRARY pixels: PNG filters, GIF LZW, BMP padding") {
    import graft.operators.multimodal.Multimodal.{BmpCodec, GifCodec, PngCodec}
    val gen = for {
      w <- Gen.choose(1, 21)
      h <- Gen.choose(1, 17)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (w, h, seed)
    holds("codec round-trips") {
      Prop.forAll(gen) { case (w, h, seed) =>
        val rnd = new java.util.Random(seed)
        val rgb = new Array[Byte](w * h * 3)
        rnd.nextBytes(rgb)
        // PNG: all five row filters rotate through; zlib inflate must
        // invert deflate byte-exactly
        val (pw, ph, png) = PngCodec.decode(PngCodec.encode(w, h, rgb))
        // BMP: row padding + bottom-up + BGR
        val (bw, bh, bmp) = BmpCodec.decode(BmpCodec.encode(w, h, rgb))
        // GIF: random indices through real LZW (random data is the
        // adversarial case for dictionary growth)
        val pal = new Array[Byte](768); rnd.nextBytes(pal)
        val idx = new Array[Byte](w * h); rnd.nextBytes(idx)
        val (gw, gh, gpal, gidx) = GifCodec.decode(GifCodec.encode(w, h, pal, idx))
        pw == w && ph == h && java.util.Arrays.equals(png, rgb) &&
          bw == w && bh == h && java.util.Arrays.equals(bmp, rgb) &&
          gw == w && gh == h && java.util.Arrays.equals(gpal, pal) &&
          java.util.Arrays.equals(gidx, idx)
      }
    }
  }

  test("PpmCodec: encode/decode round-trips; identity resize; JSON diff apply total") {
    val codec = graft.operators.multimodal.Multimodal.PpmCodec
    val imgGen = for {
      w <- Gen.chooseNum(1, 17)
      h <- Gen.chooseNum(1, 13)
      seed <- Gen.chooseNum(0, 100000)
    } yield (w, h, Array.tabulate[Byte](w * h * 3)(j => ((seed + j * 31) % 256).toByte))
    holds("ppm round-trip") {
      Prop.forAll(imgGen) { case (w, h, rgb) =>
        val (dw, dh, px) = codec.decode(codec.encode(w, h, rgb))
        dw == w && dh == h && px.sameElements(rgb)
      }
    }
    holds("resize to same size is the identity") {
      Prop.forAll(imgGen) { case (w, h, rgb) =>
        val (_, _, px) = codec.decode(codec.resize(codec.encode(w, h, rgb), w, h))
        px.sameElements(rgb)
      }
    }
    holds("features are bounded by the max luminance and cover every cell") {
      Prop.forAll(imgGen, Gen.chooseNum(1, 8)) { case ((w, h, rgb), dim) =>
        val f = codec.decodeFeatures(codec.encode(w, h, rgb), dim)
        f.length == dim && f.forall(v => v >= 0f && v <= 255f)
      }
    }
  }
}
