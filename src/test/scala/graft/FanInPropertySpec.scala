package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.streaming.FanIn

/** Property tests for the fan-in state machine (SURVEY.md §7.5 #1):
  * for ANY subset of the 4 partial kinds in ANY arrival order, the
  * assembled output is unique and obeys the reference rules:
  *   - no status partial => no output (silent purge)
  *   - status present => exactly one output carrying that status
  *   - entities are concatenated, resources hash-joined on link=url,
  *     values backfilled only for in-bounds spans. */
class FanInPropertySpec extends AnyFunSuite {

  /** scalatestplus isn't in the offline cache; drive scalacheck
    * directly (100 cases per property, fail loudly). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private val text = "spark joins the stream"

  private def status(tag: String) = TaggedPartial(tag, StreamKinds.Status,
    Some(TweetStatus(tag.toLong, text, None, isRetweet = false,
      TweetUser(1L, "u", "sn", None))), None, None, None)

  private val genEntity: Gen[LinkedEntity] = for {
    start <- Gen.chooseNum(-2, text.length + 3)
    len <- Gen.chooseNum(0, 8)
    linked <- Gen.oneOf(true, false)
    conf <- Gen.chooseNum(0, 89)
  } yield LinkedEntity(EntityPosition(start, start + len), null,
    if (linked) Some("http://kb/r/spark") else None,
    isNil = !linked, if (linked) None else Some("nil-x"),
    conf / 100.0, "CAT", None)

  private def genParts(tag: String): Gen[List[TaggedPartial]] = for {
    withStatus <- Gen.oneOf(true, false)
    nEnts <- Gen.chooseNum(0, 5)
    ents <- Gen.listOfN(nEnts, genEntity)
    withResources <- Gen.oneOf(true, false)
    withLocation <- Gen.oneOf(true, false)
    base = List(
      if (withStatus) Some(status(tag)) else None,
      Some(TaggedPartial(tag, StreamKinds.LinkedTweet, None, Some(ents), None, None)),
      if (withResources) Some(TaggedPartial(tag, StreamKinds.ResourceKind, None, None,
        Some(Seq(Resource("http://kb/r/spark", "res-spark", "t"))), None)) else None,
      if (withLocation) Some(TaggedPartial(tag, StreamKinds.DecodedLocation,
        None, None, None, Some(Coordinates(1.5, -2.5)))) else None,
    ).flatten
    shuffled <- Gen.const(scala.util.Random.shuffle(base))
  } yield shuffled

  test("assembly is a pure function of the partial SET (order-free)") {
    check(Prop.forAll(genParts("7")) { parts =>
      val a = FanIn.assemble(parts)
      val b = FanIn.assemble(parts.reverse)
      val c = FanIn.assemble(scala.util.Random.shuffle(parts))
      a == b && b == c
    })
  }

  test("output iff a status partial is present; status is preserved") {
    check(Prop.forAll(genParts("9")) { parts =>
      val out = FanIn.assemble(parts)
      val hasStatus = parts.exists(_.kind == StreamKinds.Status)
      out.isDefined == hasStatus &&
        out.forall(_.status.id == 9L)
    })
  }

  test("entity count is preserved; backfill only touches in-bounds spans") {
    check(Prop.forAll(genParts("3")) { parts =>
      FanIn.assemble(parts) match {
        case None => parts.forall(_.kind != StreamKinds.Status)
        case Some(p) =>
          val inEnts = parts.flatMap(_.entities).flatten
          p.entities.length == inEnts.length &&
            p.entities.forall { e =>
              val s = e.position.start; val t = e.position.end
              val inBounds = s >= 0 && t >= s && t <= text.length
              if (inBounds) e.value == text.substring(s, t).trim
              else e.value == null
            }
      }
    })
  }

  test("resources only attach to entities whose link matches a url") {
    check(Prop.forAll(genParts("5")) { parts =>
      FanIn.assemble(parts).forall { p =>
        val urls = parts.flatMap(_.resources).flatten.map(_.url).toSet
        p.entities.forall { e =>
          e.resource match {
            case Some(r) => e.link.contains(r.url) && urls.contains(r.url)
            case None => e.link.forall(l => !urls.contains(l))
          }
        }
      }
    })
  }
}
