package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted by graft operators whose lifetime the
  * operator itself cannot scope (the returned frames reference the cache
  * lazily, so an eager unpersist inside the operator would defeat it).
  *
  * Pins are attributed to a [[Scope]] so concurrent pipelines in one JVM
  * can release only their own prep tables: wrap each batch in
  * [[Caches.inScope]] and call `scope.release()` after fully consuming the
  * frames that batch returned. Without an explicit scope, pins land in the
  * global scope; the global [[release]] drains EVERY scope and remains the
  * single-pipeline escape hatch (Verify/Bench call it between queries).
  * Releasing one scope never unpins another's frames — the failure mode the
  * all-or-nothing registry had was one caller's release silently degrading
  * a concurrent caller's persist-barriered subtrees to full recompute.
  */
object Caches {

  /** A releasable group of pinned frames. Obtain via [[newScope]]. */
  final class Scope private[Caches] () {
    private[Caches] val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    private[Caches] def add(df: DataFrame): Unit = synchronized { frames += df }

    /** Persist `df` and track it in THIS scope, regardless of the calling
      * thread's active scope — the explicit-attribution face for operators
      * that accept a scope parameter (e.g. [[Graphs.pageRankInt]]).
      */
    def pin(df: DataFrame): DataFrame = { add(df); df.persist() }

    /** Unpersist only this scope's frames. Safe to call more than once. */
    def release(blocking: Boolean = false): Unit = {
      val toDrop = synchronized { val fs = frames.toList; frames.clear(); fs }
      toDrop.foreach(_.unpersist(blocking))
      Caches.forget(this)
    }
  }

  private val globalScope = new Scope
  private val scopes = scala.collection.mutable.ArrayBuffer[Scope](globalScope)
  private val current = new ThreadLocal[Scope] { override def initialValue(): Scope = globalScope }

  /** Create a scope and register it for the global [[release]]. */
  def newScope(): Scope = scopes.synchronized {
    val s = new Scope
    scopes += s
    s
  }

  private def forget(s: Scope): Unit = scopes.synchronized {
    if (s ne globalScope) scopes -= s
  }

  /** Run `body` with operator pins attributed to `scope`. Attribution is
    * per-thread and captured at PLAN-CONSTRUCTION time (when the operator
    * calls pin), which is when graft operators persist — lazy execution of
    * the returned frames needs no scope.
    */
  def inScope[T](scope: Scope)(body: => T): T = {
    val prev = current.get()
    current.set(scope)
    try body
    finally current.set(prev)
  }

  /** Persist `df` and track it in the calling thread's active scope. */
  def pin(df: DataFrame): DataFrame = current.get().pin(df)

  /** Unpersist every operator-pinned frame in this JVM, across all scopes.
    * Pass `blocking = true` when the caller needs storage memory actually
    * drained before proceeding (e.g. a benchmark timing the next query) —
    * async eviction otherwise overlaps whatever runs next.
    */
  def release(blocking: Boolean = false): Unit = {
    val all = scopes.synchronized { scopes.toList }
    all.foreach(_.release(blocking))
  }
}
