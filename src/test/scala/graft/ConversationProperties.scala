package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.Conversations

/** Property coverage for the post-training chat operators: every law is
  * checked against an INDEPENDENT sequential Scala mirror over random
  * transcripts — shapes the hand-built witnesses can't enumerate.
  */
object ConversationProperties extends Properties("graft.conversations") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genRole: Gen[String] =
    Gen.frequency(4 -> "user", 4 -> "assistant", 2 -> "tool",
      1 -> "system", 1 -> "function")
  private val genContent: Gen[String] =
    Gen.frequency(6 -> Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString),
      1 -> Gen.const(""), 1 -> Gen.const(" "))
  private val genConv: Gen[List[(String, String)]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.zip(genRole, genContent)))

  private def toJson(turns: List[(String, String)]): String =
    turns.map { case (r, c) => s"""{"role":"$r","content":"$c"}""" }
      .mkString("[", ",", "]")

  /** Sequential mirror of the tool-contract audit. */
  private def mirror(turns: List[(String, String)]): (Boolean, Boolean, Boolean, Boolean) = {
    val legal = Set("system", "user", "assistant", "tool")
    val roleLegal = turns.zipWithIndex.forall { case ((r, _), i) =>
      legal(r) && (r != "system" || i == 0)
    }
    val allowed: ((String, String)) => Boolean = {
      case ("system", "user") => true
      case ("user", "assistant") => true
      case ("assistant", "tool") | ("assistant", "user") => true
      case ("tool", "tool") | ("tool", "assistant") => true
      case _ => false
    }
    val transOk = turns.map(_._1).sliding(2).filter(_.size == 2)
      .forall(p => allowed((p(0), p(1))))
    val noEmpty = turns.forall(_._2.trim.nonEmpty)
    val endsAsst = turns.last._1 == "assistant"
    (roleLegal, transOk, noEmpty, endsAsst)
  }

  property("validateWithTools equals the sequential mirror on random transcripts") =
    forAll(genConv) { conv =>
      val df = Seq((1L, toJson(conv))).toDF("id", "j")
      val row = Conversations.validateWithTools(
        Conversations.parseTurns(df, "id", "j"), "id").head()
      val (rl, tr, ne, ea) = mirror(conv)
      val starts = Set("system", "user")(conv.head._1)
      row.getAs[Long]("n_turns") == conv.size.toLong &&
        row.getAs[Boolean]("starts_ok") == starts &&
        row.getAs[Boolean]("role_legal") == rl &&
        row.getAs[Boolean]("transitions_ok") == tr &&
        row.getAs[Boolean]("no_empty") == ne &&
        row.getAs[Boolean]("ends_assistant") == ea &&
        row.getAs[Boolean]("valid") ==
          (conv.size >= 2 && starts && rl && tr && ne && ea)
    }

  /** Sequential mirror of the budget truncation. */
  private def truncMirror(
      turns: List[(String, String)], budget: Long): Set[Int] = {
    val toks = turns.map(_._2.trim.split("\\s+").count(_.nonEmpty).toLong)
    val sysIdx = if (turns.head._1 == "system") Some(0) else None
    val sysTok = sysIdx.map(toks(_)).getOrElse(0L)
    val body = turns.zipWithIndex.filterNot { case (_, i) => sysIdx.contains(i) }
    // maximal suffix of body fitting budget - sysTok
    val rem = budget - sysTok
    val kept = scala.collection.mutable.Set.empty[Int]
    var acc = 0L
    body.reverse.foreach { case ((_, _), i) =>
      acc += toks(i)
      if (acc <= rem) kept += i
    }
    // forward-trim to the first kept user turn
    val userKept = kept.filter(i => turns(i)._1 == "user")
    if (userKept.isEmpty) Set.empty
    else {
      val first = userKept.min
      kept.filter(_ >= first).toSet ++ sysIdx.toSet
    }
  }

  property("truncateToBudget equals the sequential mirror on random transcripts") =
    forAll(genConv, Gen.choose(1L, 12L)) { (conv, budget) =>
      val df = Seq((1L, toJson(conv))).toDF("id", "j")
      val got = Conversations.truncateToBudget(
        Conversations.parseTurns(df, "id", "j"), "id", budget)
        .collect().map(_.getInt(1)).toSet
      got == truncMirror(conv, budget)
    }
}
