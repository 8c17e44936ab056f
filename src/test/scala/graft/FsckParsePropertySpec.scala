package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seeded property sweep of the fsck CLI parser: for ANY argument
  * list, parse either throws the usage error or returns a layout that
  * accounts for EVERY argument — nothing silently dropped, nothing
  * invented. The ADVICE r18 bug (`--embed --ivf x` bound "--ivf" as
  * the embed path and dropped the intended --ivf root) is an instance
  * of the no-drop half; pinning the invariant over generated inputs
  * closes the parser surface, not just that one shape. Pure JVM — no
  * SparkSession, so the sweep is cheap enough for 4 000 cases. */
class FsckParsePropertySpec extends AnyFunSuite {

  private val Flags = Seq("--embed", "--ivf", "--ivf-base", "--release")

  test("parse: every generated arg list either throws usage or accounts for every argument") {
    val rnd = new scala.util.Random(20260816L)
    def token(): String = rnd.nextInt(6) match {
      case 0 => Flags(rnd.nextInt(Flags.length)) // a bare flag token
      case 1 => s"--bogus${rnd.nextInt(3)}"      // an unknown flag
      case _ => s"p${rnd.nextInt(50)}"           // a plausible path
    }
    def path(): String = s"p${rnd.nextInt(50)}"
    var parsed, rejected = 0
    (1 to 4000).foreach { i =>
      // half the sweep is fully random (drives the rejection arms:
      // short lists, flag-like positionals, value-less and unknown
      // flags, flag-as-value); half is structured around the valid
      // grammar (drives the accounting invariant deep — many pairs,
      // repeated flags, the occasional duplicate --embed rejection)
      val args =
        if (i % 2 == 0) Seq.fill(rnd.nextInt(10))(token())
        else Seq.fill(3)(path()) ++
          Seq.fill(rnd.nextInt(5))(
            (Flags(rnd.nextInt(Flags.length)), path()))
            .flatMap(p => Seq(p._1, p._2))
      val result =
        try Right(FsckMain.parse(args))
        catch { case e: IllegalArgumentException => Left(e) }
      result match {
        case Left(e) =>
          rejected += 1
          assert(e.getMessage.contains("usage:"),
            s"a rejection must carry the usage text, got: ${e.getMessage}")
        case Right(layout) =>
          parsed += 1
          // positional contract: the first three args, verbatim
          assert(Seq(layout.corpus, layout.signatures, layout.clusters) ==
            args.take(3), s"$args -> $layout")
          // NO-DROP + NO-INVENT: the tail is exactly the consumed
          // (flag, value) pairs, in order — rebuilding the arg list
          // from the layout must reproduce the input up to the
          // (order-preserving) per-flag sequences
          val tail = args.drop(3)
          assert(tail.length % 2 == 0, s"odd tail parsed: $args")
          val pairs = tail.grouped(2).map(p => (p(0), p(1))).toSeq
          assert(pairs.forall { case (f, v) =>
            Flags.contains(f) && !v.startsWith("--") },
            s"accepted a malformed pair: $args")
          assert(pairs.filter(_._1 == "--embed").map(_._2) ==
            layout.embed.toSeq, s"$args -> $layout")
          assert(pairs.filter(_._1 == "--ivf").map(_._2) ==
            layout.ivf, s"$args -> $layout")
          assert(pairs.filter(_._1 == "--ivf-base").map(_._2) ==
            layout.ivfBases, s"$args -> $layout")
          assert(pairs.filter(_._1 == "--release").map(_._2) ==
            layout.releases, s"$args -> $layout")
          // round-trip: a canonical rebuild re-parses to the SAME layout
          val rebuilt = args.take(3) ++ pairs.flatMap(p => Seq(p._1, p._2))
          assert(FsckMain.parse(rebuilt) == layout, s"round-trip: $args")
      }
    }
    // the sweep must actually exercise both arms (a generator drift
    // that stops producing valid shapes would hollow the property out)
    assert(parsed > 500 && rejected > 500,
      s"degenerate sweep: parsed=$parsed rejected=$rejected")
  }
}
