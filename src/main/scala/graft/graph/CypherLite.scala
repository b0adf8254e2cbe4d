package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A small Cypher front-end over the (nodes, edges) property-graph
  * frames — the textual query surface a user of the reference's Neo4j
  * deployment already writes, compiled to DataFrame joins (so Catalyst
  * plans/broadcasts/prunes it like any other query).
  *
  * Supported subset (the patterns the reference's analysts actually
  * run — see events.py's schema):
  *
  * {{{
  * MATCH (p:Process)-[:INJECTED_THREAD]->(), (p)-[r:CONNECTED_TO]->(ip:Ip)
  * WHERE r.dport > 1024 OR r.dport = '443'
  * WITH p, count(*) AS n WHERE n >= 2
  * MATCH (t:Trace)-[:HAS_PROCESS]->(p)
  * RETURN t, p, n ORDER BY n DESC LIMIT 10
  * }}}
  *
  *  - MULTI-PATTERN MATCH: comma-separated linear chains joined on
  *    their shared variables (each chain after the first must share at
  *    least one variable with the chains before it — disconnected
  *    products are rejected); anonymous nodes `()`; a variable may
  *    repeat within/across chains (cycle patterns become equality
  *    joins)
  *  - forward `-[:T]->` and reverse `<-[:T]-` hops, variable-length
  *    `-[:T*1..3]->` and `-[:T*]->` (bounded at 10)
  *  - node labels optional; `v.id` is the node key, any other `v.prop`
  *    reads the property map; edge variables `-[r:T]->` expose edge
  *    props and `r.event_id`
  *  - WHERE: `=`, `<>`, `CONTAINS`, `STARTS WITH`, `ENDS WITH` against
  *    'string' literals, and `>`, `>=`, `<`, `<=`, `=`, `<>` against
  *    numeric literals (property cast to double, null-safe); combined
  *    with AND / OR and parentheses (standard precedence); bare
  *    identifiers (`n > 3`) reference WITH aliases. General
  *    comparisons between scalar EXPRESSIONS: prop-to-prop
  *    (`a.image = b.image` — string-typed), and `+`, `-`, `*`, `/`
  *    arithmetic with `toInteger`/`toFloat` coercions
  *    (`(toInteger(r.dport) + 1) * 2 > 500`) and the scalar functions
  *    `toLower`/`toUpper`/`size` (string length, or ELEMENT COUNT when
  *    the argument is a list column — the collect→size idiom; `size`
  *    counts as numeric), `coalesce(a, b, …)` (first non-null — the
  *    reference's own Cypher idiom), and the accessors `labels(v)`
  *    (single-element label array), `keys(v)` (sorted property names),
  *    `properties(v)` (the property map) over node or edge variables;
  *    any numeric term switches the whole comparison to
  *    double. List membership `x IN ['a', 'b']` (literal list → isin)
  *    and `x IN ips` (a carried collect(...) list column →
  *    array_contains); anchored regex `p.image =~ '.*\\.exe'` (Cypher
  *    =~ matches the WHOLE string — compiled as rlike('^(?:pat)$'));
  *    searched `CASE WHEN <pred> THEN <expr> … [ELSE <expr>] END` in
  *    any term position (branch predicates use the full WHERE
  *    grammar); temporal constructors `date(x)` / `datetime(x)` (cast
  *    stored strings to DATE/TIMESTAMP for typed comparison),
  *    `timestamp(x)` (epoch millis, numeric — so durations are plain
  *    arithmetic) and `duration('PT5M')` (ISO-8601 literal → millis);
  *    CALENDAR durations (`duration('P1M')`, `duration({months: 1})`
  *    — years/months have no fixed millis) are supported in the
  *    anchored additive position `datetime(x) + duration('P1M')` /
  *    `date(x) - duration({years: 1})` (compiled to Spark's
  *    make_interval — add_months semantics), and rejected with a
  *    clear error anywhere else;
  *    graph accessors `type(r)` (relationship type of a named
  *    single-hop edge variable), `startNode(r)` / `endNode(r)` (the
  *    edge's source/destination node id in GRAPH direction — a
  *    reverse hop's startNode is still the edge's source), and
  *    `id(v)` (the node KEY — this
  *    model's ids are strings); list accessors `head(xs)` / `last(xs)`
  *    (null on empty, Cypher semantics) and `range(a, b)` inclusive
  *    integer lists; string kit `trim`/`ltrim`/`rtrim`/`toString`/
  *    `split(s, delim)` (LITERAL delimiter, returns a list) /
  *    `replace(s, find, repl)` (literal) / `substring(s, start[, len])`
  *    (0-indexed, Cypher semantics); math kit `abs`/`round`/`floor`/
  *    `ceil`/`sqrt`/`sign` and the `%` modulo operator; list
  *    comprehensions `[x IN xs WHERE p | e]` (either part optional —
  *    filter()/transform() HOFs; the variable is lambda-local, other
  *    refs capture row columns) and the quantified list predicates
  *    `any`/`all`/`none`/`single(x IN xs WHERE p)` (exists()/forall())
  *    and `reduce(acc = init, x IN xs | expr)` (aggregate() HOF) —
  *    comprehensions, quantifiers, and reduce NEST (inner lambda
  *    variables shadow outer ones); the pattern-count idiom
  *    `size((p)-[:T]->(x))` (matches anchored at the row's chain-head
  *    value, 0 when none — an aggregated semi-join, numeric in any
  *    term position) and its Cypher-5 spelling
  *    `COUNT { [MATCH] (p)-[:T]->(x) [WHERE <pred>] }` (the
  *    `EXISTS { [MATCH] … [WHERE …] }` subquery form is likewise sugar
  *    for the exists() pattern predicate; an inner WHERE — full
  *    predicate grammar over the pattern's variables, e.g.
  *    `EXISTS { MATCH (p)-[r:CONNECTED_TO]->(i) WHERE r.dport = '443' }`
  *    — filters the matches before counting/existence). `NOT <pred>`,
  *    `<expr> IS [NOT] NULL`, and the pattern predicate
  *    `exists((p)-[:T]->(x))` (anchored at a bound variable; fresh
  *    pattern variables are existential) — also spellable BARE, the
  *    Neo4j idiom `WHERE (p)-[:T]->(x)` — `NOT exists(...)` is the
  *    anti-join, `OPTIONAL MATCH … WITH … WHERE ip IS NULL` the
  *    Cypher anti-join idiom, both spec'd against hand-written
  *    semi/anti joins
  *  - r10: pattern COMPREHENSIONS `[(a)-[:T]->(x) [WHERE p] | expr]`
  *    (sorted collect_list over the matches, [] empty-fill), edge
  *    variables on VAR-LENGTH hops (`-[r:T*1..3]->` binds `r` as the
  *    relationship list, one row per distinct path, relationship-
  *    isomorphism enforced), GENERIC PATH VARIABLES
  *    (`MATCH p = <chain>` with nodes(p)/relationships(p)/length(p)
  *    and bare `p` as the '>'-joined node string), SIMPLE CASE
  *    (`CASE x WHEN v THEN …`), list subscripts `xs[i]`/`xs[a..b]`,
  *    ORDER BY on non-returned properties of returned variables, and
  *    property maps with nesting to depth 4
  *  - OPTIONAL MATCH (any number of chains, each starting at a bound
  *    variable — including one bound by an earlier optional chain)
  *    with Cypher semantics: WHERE conjuncts that reference only one
  *    optional chain's variables filter that chain BEFORE its left
  *    join (non-matching rows keep nulls); a conjunct mixing optional
  *    and required variables is rejected rather than silently
  *    diverging
  *  - RETURN [DISTINCT] items: `v`, `v.prop`, `count(*)`, `count(v)`,
  *    `sum(v.prop)`, `avg(v.prop)`, `min(v.prop)`, `max(v.prop)`,
  *    `collect(v)`/`collect(v.prop)` — aggregates trigger Cypher's
  *    implicit grouping on the plain items. `DISTINCT` inside an
  *    aggregate (`count(DISTINCT ip)`, `sum(DISTINCT …)`,
  *    `collect(DISTINCT …)`; no-op under min/max) deduplicates the
  *    aggregated values per group. `sum`/`avg` aggregate the
  *    double-cast value (props are stored as strings; non-numeric →
  *    null, ignored); `min`/`max`/`collect` use the raw string value
  *    unless wrapped in Cypher's coercions `toInteger(...)` /
  *    `toFloat(...)` (e.g. `max(toInteger(r.dport))` orders
  *    numerically); `collect` returns a SORTED array for
  *    deterministic output. Output columns: `v`, `v_prop`, `count`,
  *    `sum_v_prop`, … or the `AS` alias. An item may also be an
  *    aliased scalar EXPRESSION in the WHERE term grammar
  *    (`toInteger(r.dport) * 2 + 1 AS odd_port` — the alias is
  *    required), plain or under an aggregate
  *    (`sum(toInteger(r.dport) * 2) AS s`)
  *  - `WITH [DISTINCT]` pipeline stages (any number): `MATCH … WITH items
  *    [WHERE having] [ORDER BY … [SKIP n] [LIMIT n]]
  *    [MATCH …pattern(s) [OPTIONAL MATCH …]] WITH … RETURN …` — each
  *    WITH's items (aggregates allowed, `AS` aliases) project the
  *    stage so far; its having-WHERE filters the projection; ORDER
  *    BY/SKIP/LIMIT implement the top-k-then-continue idiom (order
  *    alone doesn't survive the next join — Cypher semantics too); a
  *    follow-on MATCH joins new patterns on the carried variables
  *  - `UNWIND xs AS x` stages (interleaved with WITH anywhere after
  *    the first MATCH): explode a carried list column — typically a
  *    `collect(...)` alias, the Cypher collect→UNWIND idiom — a
  *    literal `[...]` list, or any list-valued term
  *    (`UNWIND range(1, 5) AS i` — inclusive, Cypher semantics), one
  *    row per element, source kept in scope; may carry its own
  *    follow-on MATCH like a WITH
  *  - `MATCH p = shortestPath((a)-[:T*]->(b))`: with `a.id = '…'`
  *    pinned in WHERE, one single-source BFS
  *    ([[GraphOps.bfsPaths]]); UNPINNED, the all-pairs form — every
  *    node matching a's label is a root — compiled to ONE multi-
  *    source keyed BFS ([[GraphOps.bfsPathsFrom]], never a per-root
  *    loop). `allShortestPaths((a)-[:T*]->(b))` is the keep-every-tie
  *    variant ([[GraphOps.bfsAllPathsFrom]]): one row per tied
  *    minimal-length path. Per-hop greedy lexicographic tie-break
  *    for the single-path form;
  *    `RETURN` may use `a`, `b`, their props, `p` (the '>'-joined
  *    path string), `length(p)`, `nodes(p)` (the node-id array), and
  *    `relationships(p)` (one `src-[TYPE]->dst` string per step)
  *  - ORDER BY over returned items; SKIP n; LIMIT n
  *  - `UNION` / `UNION ALL` between full queries (each part a complete
  *    MATCH…RETURN pipeline): parts must return the same column names
  *    (Cypher's rule); bare UNION deduplicates, ALL keeps everything;
  *    mixing the two in one query is rejected (as in Neo4j)
  *
  * Each single hop is one equi-join on the edge frame; a
  * variable-length hop materializes the bounded (from, to) hop-pair
  * set via iterated joins (distinct per depth) — the same shapes the
  * hand-written operators use, so the 100 TB story is unchanged.
  */
object CypherLite {

  /** `props` are inline property-map equality constraints —
    * `(p:Process {image: 'cmd.exe'})` — as (key, literal, numeric)
    * triples; sugar for one `=` conjunct per entry, but compiled as a
    * filter pushed into the node/edge scan (cheaper than a post-join
    * WHERE). The reference's own MERGE idiom (events.py:75-257 writes
    * `MERGE (p:Process {key: $key})`). */
  final case class NodePat(v: String, label: Option[String],
                           props: Seq[(String, String, Boolean)] = Nil)
  final case class EdgePat(etype: Option[String], min: Int, max: Int, reverse: Boolean,
                           v: Option[String] = None,
                           props: Seq[(String, String, Boolean)] = Nil)
  final case class Cond(v: String, prop: Option[String], op: String, value: String,
                        numeric: Boolean)

  /** Scalar term of a general WHERE comparison: property refs, string/
    * numeric literals, toInteger/toFloat coercions, and +,-,*,/
    * arithmetic. Comparisons touching any numeric term evaluate both
    * sides as doubles; pure ref/string comparisons stay string-typed
    * (matching the stored property type — see the class doc on typing). */
  sealed trait Term { def vars: Set[String] }
  final case class PropT(v: String, prop: Option[String]) extends Term { def vars: Set[String] = Set(v) }
  final case class NumT(value: Double) extends Term { def vars: Set[String] = Set.empty }
  final case class StrT(value: String) extends Term { def vars: Set[String] = Set.empty }
  final case class CastT(fn: String, t: Term) extends Term { def vars: Set[String] = t.vars }
  final case class ArithT(op: String, l: Term, r: Term) extends Term { def vars: Set[String] = l.vars ++ r.vars }
  /** String scalar functions: toLower / toUpper / size (string length),
    * plus the node accessors labels / keys / properties (argument must
    * be a bare node or edge variable). */
  final case class FuncT(fn: String, t: Term) extends Term { def vars: Set[String] = t.vars }
  /** `coalesce(a, b, …)` — first non-null, the reference's own Cypher
    * idiom (events.py writes coalesce into every MERGE). */
  final case class CoalesceT(ts: Seq[Term]) extends Term { def vars: Set[String] = ts.flatMap(_.vars).toSet }
  /** Literal list `['a', 'b']` / `[1, 2, 3]` — the rhs of IN, an
    * argument to size(), or any term position (compiles to array()). */
  final case class ListT(ts: Seq[Term]) extends Term { def vars: Set[String] = ts.flatMap(_.vars).toSet }
  /** `range(a, b)` — inclusive integer sequence (Cypher semantics;
    * compiles to Spark's sequence(), also inclusive). */
  final case class RangeT(a: Term, b: Term) extends Term { def vars: Set[String] = a.vars ++ b.vars }
  /** Multi-argument scalar functions: split / replace / substring. */
  final case class FuncN(fn: String, ts: Seq[Term]) extends Term {
    def vars: Set[String] = ts.flatMap(_.vars).toSet
  }
  /** List comprehension `[x IN xs WHERE p | e]` (either part optional)
    * — compiles to Spark's filter()/transform() higher-order functions.
    * The comprehension variable is LOCAL: it resolves to the lambda
    * argument, not a row column; other refs capture enclosing columns. */
  final case class CompT(v: String, src: Term, where: Option[Pred], proj: Option[Term]) extends Term {
    def vars: Set[String] =
      src.vars ++ (where.toSeq.flatMap(_.vars) ++ proj.toSeq.flatMap(_.vars)).filterNot(_ == v)
  }
  /** `reduce(acc = init, x IN xs | expr)` — Cypher's fold, compiled to
    * Spark's aggregate() HOF. Both `acc` and `x` are lambda-local. */
  final case class ReduceT(acc: String, init: Term, v: String, src: Term, expr: Term) extends Term {
    def vars: Set[String] =
      init.vars ++ src.vars ++ expr.vars.filterNot(w => w == acc || w == v)
  }
  /** `size((p)-[:T]->(x))` — pattern-count term (the classic inline-
    * degree idiom): the number of pattern matches anchored at the
    * row's value of the chain-head variable; fresh variables are
    * existential. Numeric. `where` carries the inner predicate of the
    * Cypher-5 `COUNT { MATCH … WHERE … }` spelling — it filters the
    * pattern matches (over pattern variables) before counting. */
  final case class SizePat(chain: (Seq[NodePat], Seq[EdgePat]),
                           where: Option[Pred] = None) extends Term {
    def vars: Set[String] = Set(chain._1.head.v)
  }
  /** `[(a)-[:T]->(x) [WHERE p] | expr]` — pattern COMPREHENSION (the
    * list-building sibling of COUNT{}/size(<pattern>)): the list of
    * `expr` over the pattern matches anchored at the row's chain-head
    * value. Duplicates kept (a multiset, like Neo4j); elements SORTED
    * — set-based execution has no row order and Neo4j's is
    * unspecified, so the sorted list is this engine's deterministic
    * choice. The inner WHERE and `expr` see the pattern's variables
    * only (an enclosing-scope reference is a loud unbound error, not a
    * silent rebind). */
  final case class PatCompT(chain: (Seq[NodePat], Seq[EdgePat]),
                            where: Option[Pred], proj: Term,
                            distinct: Boolean = false) extends Term {
    def vars: Set[String] = Set(chain._1.head.v)
  }
  /** Map projection `n {.a, .b}` / `n {.*}` (Neo4j's property-subset
    * idiom): a map of the listed properties (or the full props map for
    * `.*`) of a bound node/edge variable. Star and listed items do not
    * mix (loud) — the merge semantics differ between engines. */
  final case class MapProjT(v: String, props: Seq[String],
                            star: Boolean) extends Term {
    def vars: Set[String] = Set(v)
  }
  /** Postfix list subscript `xs[i]` — Cypher 0-indexed, negatives from
    * the end, null past either bound. */
  final case class IndexT(src: Term, i: Int) extends Term {
    def vars: Set[String] = src.vars
  }
  /** Postfix list slice `xs[a..b]` — start inclusive, end exclusive,
    * 0-indexed, negatives from the end, either bound omissible
    * (`xs[..2]`, `xs[1..]`); out-of-range clamps like Cypher. */
  final case class SliceT(src: Term, from: Option[Int],
                          to: Option[Int]) extends Term {
    def vars: Set[String] = src.vars
  }
  /** Searched `CASE WHEN p THEN t [WHEN …]* [ELSE e] END` (null when no
    * branch matches and no ELSE — Cypher semantics). */
  final case class CaseT(branches: Seq[(Pred, Term)], els: Option[Term]) extends Term {
    def vars: Set[String] =
      branches.flatMap { case (p, t) => p.vars ++ t.vars }.toSet ++ els.toSeq.flatMap(_.vars)
  }

  sealed trait Pred { def vars: Set[String] }
  final case class Leaf(c: Cond) extends Pred { def vars: Set[String] = Set(c.v) }
  /** General comparison: `expr op expr` — covers prop-to-prop equality
    * (`p.Image = c.Image`) and arithmetic (`toInteger(r.dport) - 8000 > 0`),
    * which the fast-path [[Leaf]] (ref-vs-literal) cannot express. */
  final case class CmpLeaf(l: Term, op: String, r: Term) extends Pred { def vars: Set[String] = l.vars ++ r.vars }
  /** `v.prop IS [NOT] NULL` — the post-OPTIONAL-MATCH idiom. */
  final case class NullLeaf(t: Term, isNull: Boolean) extends Pred { def vars: Set[String] = t.vars }
  /** `x IN [...]` (literal list) or `x IN listCol` (a carried
    * collect(...) alias) — list membership. */
  final case class InPred(l: Term, r: Term) extends Pred { def vars: Set[String] = l.vars ++ r.vars }
  /** Quantified list predicate `any/all/none/single(x IN xs WHERE p)`
    * — compiles to exists()/forall() higher-order functions. The
    * quantifier variable is local to the lambda. */
  final case class QuantPred(q: String, v: String, src: Term, where: Pred) extends Pred {
    def vars: Set[String] = src.vars ++ where.vars.filterNot(_ == v)
  }
  /** Cypher negation (`NOT <pred>`). */
  final case class Not(p: Pred) extends Pred { def vars: Set[String] = p.vars }
  /** Pattern predicate `exists((p)-[:T]->(x))`: true iff the chain
    * matches starting from the row's `anchor` value. Fresh pattern
    * variables are existential (not bound into the row); `vars` is the
    * anchor only, so WHERE-conjunct routing sees the real dependency. */
  final case class ExistsPat(chain: (Seq[NodePat], Seq[EdgePat]), anchor: String,
                             where: Option[Pred] = None) extends Pred {
    def vars: Set[String] = Set(anchor)
  }
  /** `n:Label` / `n:A|B&!C` in PREDICATE position (Neo4j's label
    * test): does the variable's value carry the label (expression)?
    * Set-based semantics — membership of the value in the label
    * expression's node-id set, flag-joined so it composes under
    * NOT/OR. Rejected inside list lambdas (no node binding there). */
  final case class LabelPred(v: String, expr: String) extends Pred {
    def vars: Set[String] = Set(v)
  }
  final case class And(ps: Seq[Pred]) extends Pred { def vars: Set[String] = ps.flatMap(_.vars).toSet }
  final case class Or(ps: Seq[Pred]) extends Pred { def vars: Set[String] = ps.flatMap(_.vars).toSet }

  /** One RETURN/WITH item: agg = None for plain `v`/`v.prop`; otherwise
    * the aggregate function name ("count", "sum", …) with `v`=="*" for
    * `count(*)` and "length" for `length(p)`. `cast` carries an inner
    * toInteger/toFloat (Cypher's numeric coercion — e.g.
    * `max(toInteger(r.dport))` orders numerically, not as strings);
    * `alias` an `AS name`. */
  final case class RetItem(agg: Option[String], v: String, prop: Option[String],
                           cast: Option[String] = None, alias: Option[String] = None,
                           term: Option[Term] = None, adistinct: Boolean = false,
                           aggArg: Option[Double] = None) {
    def outName: String = alias.getOrElse(agg match {
      case None => prop.map(p => s"${v}_$p").getOrElse(v)
      case Some("count") if v == "*" => "count"
      case Some(a) => s"${a}_$v" + prop.map(p => s"_$p").getOrElse("")
    })
  }

  /** `all = true` for `allShortestPaths(...)`: keep EVERY tied
    * minimal-length path per endpoint pair, not the per-hop-greedy
    * minimum. */
  final case class ShortestPat(pathVar: String, a: NodePat, hop: EdgePat, b: NodePat,
                               all: Boolean = false)

  /** One MATCH stage: main chains + optional chains + WHERE.
    * `paths` binds GENERIC path variables — `MATCH p = (a)-[:T*]->(b)`
    * — as (pathVar → main-chain index); every hop of a path-bound
    * chain gets an edge variable at parse time (fresh names for
    * unnamed hops) so the walk carries the per-hop relationship data
    * the `nodes(p)`/`relationships(p)`/`length(p)` accessors need. */
  final case class MatchStage(patterns: Seq[(Seq[NodePat], Seq[EdgePat])],
                              optChains: Seq[(Seq[NodePat], Seq[EdgePat])],
                              where: Option[Pred],
                              paths: Seq[(String, Int)] = Nil)
  /** A pipeline stage between MATCH and RETURN: `WITH` or `UNWIND`. */
  sealed trait PipeStage
  /** One WITH pipeline stage: projection items (aggregates allowed),
    * a having-WHERE over the projection, and an optional follow-on
    * MATCH joining new patterns on the carried variables. `distinct`
    * is Cypher's `WITH DISTINCT items` (dedup the projection). */
  final case class WithStage(items: Seq[RetItem], having: Option[Pred],
                             next: Option[MatchStage],
                             distinct: Boolean = false,
                             orderBy: Seq[(String, Boolean)] = Seq.empty,
                             skip: Option[Int] = None,
                             limit: Option[Int] = None,
                             // Cypher-5 clause order puts WHERE after
                             // ORDER BY/SKIP/LIMIT and applies it after
                             // them; the pre-ORDER-BY spelling filters
                             // before (both accepted, not together)
                             havingAfterLimit: Boolean = false) extends PipeStage
  /** `UNWIND xs AS x`: explodes a carried list column (typically a
    * `collect(...)` alias), a literal `[...]` list, or any list-valued
    * term (`range(1, 5)`) into one row per element; the source stays
    * in scope (Cypher semantics). An optional follow-on MATCH joins
    * new patterns on the carried variables, like a WITH's. */
  final case class UnwindStage(srcVar: Option[String], literals: Seq[String],
                               literalsNumeric: Boolean, alias: String,
                               next: Option[MatchStage],
                               srcTerm: Option[Term] = None) extends PipeStage
  /** Mid-query `CALL { [WITH imports] <inner> }` subquery stage
    * (Cypher-5 correlated subqueries): the inner pipeline compiles
    * against the DISTINCT imported-variable combinations and its
    * declared outputs join back onto the outer frame per combo —
    * set-based execution of Neo4j's per-row semantics (equal rows get
    * equal results, so evaluating per distinct combo and joining back
    * is faithful). An all-aggregate RETURN left-joins with Cypher's
    * empty-input fills (count→0, sum→0, collect→[]); any other RETURN
    * inner-joins (a row with no subquery rows is dropped — Neo4j's
    * rule). No importing WITH = uncorrelated (cross join). */
  final case class CallStage(imports: Seq[String], inners: Seq[Query],
                             unionAll: Boolean,
                             next: Option[MatchStage]) extends PipeStage
  final case class Query(stage: MatchStage,
                         withStages: Seq[PipeStage] = Seq.empty,
                         ret: Seq[RetItem] = Seq.empty, distinct: Boolean = false,
                         orderBy: Seq[(String, Boolean)] = Seq.empty,
                         skip: Option[Int] = None,
                         limit: Option[Int] = None,
                         sp: Option[ShortestPat] = None)

  /** `{key: 'value', n: 42}` — quote-aware so a '}' inside a string
    * literal doesn't close the map early; allows list values and maps
    * nested to depth 4 (canonicalized via [[PropLiterals]], which is
    * depth-unbounded — the regex is the only bound, since regular
    * expressions cannot express arbitrary nesting; a deeper literal
    * fails the node/edge-pattern match loudly instead of truncating). */
  private val PropsMap: String = {
    def lvl(n: Int): String =
      if (n == 0) """\{(?:[^{}']|'[^']*')*\}"""
      else s"""\\{(?:[^{}']|'[^']*'|${lvl(n - 1)})*\\}"""
    lvl(3)
  }
  // node labels accept Cypher-5 LABEL EXPRESSIONS (`:A|B`, `:A&B`,
  // `:!A` — precedence ! > & > |); edge types accept disjunction only
  // (`:A|B`). Parenthesized label expressions are out of scope: the
  // charclass won't match them, so they fail the chain-arity check
  // loudly instead of silently dropping the label.
  private val NodeRe = ("""\(\s*(\w+)?\s*(?::\s*([\w|&!]+))?\s*(""" + PropsMap + """)?\s*\)""").r
  private val FwdRe = ("""-\[\s*(\w+)?\s*(?::([\w|]+))?\s*(?:(\*)(?:(\d+)\.\.(\d+))?)?\s*(""" + PropsMap + """)?\s*\]->""").r
  private val RevRe = ("""<-\[\s*(\w+)?\s*(?::([\w|]+))?\s*(?:(\*)(?:(\d+)\.\.(\d+))?)?\s*(""" + PropsMap + """)?\s*\]-""").r
  private val PropKeyRe = """(?s)^(\w+)\s*:\s*(.+)$""".r
  private val PropStrRe = """^'([^']*)'$""".r
  private val PropNumRe = """^-?\d+(?:\.\d+)?$""".r
  /** Parse a `{k: v, …}` property map (braces included) to
    * (key, literal, numeric) triples. Values are string / numeric
    * literals, or composite list/map literals of ANY nesting depth
    * (each entry is already isolated by the depth-aware
    * [[splitTopLevel]], and [[PropLiterals.canonical]] recurses —
    * composites compare as their canonical serialized text, the
    * storage form CypherWrite uses); `$param` entries are not in the
    * subset. */
  private def parsePropsMap(s0: String): Seq[(String, String, Boolean)] = {
    val body = s0.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) Nil
    else splitTopLevel(body).map { ent =>
      ent.trim match {
        case PropKeyRe(k, vraw) =>
          val v = vraw.trim
          v match {
            case PropStrRe(s) => (k, s, false)
            case _ if PropNumRe.pattern.matcher(v).matches() => (k, v, true)
            case _ if v.startsWith("[") || v.startsWith("{") =>
              (k, PropLiterals.canonical(v), false)
            case _ => throw new IllegalArgumentException(
              s"bad property-map entry '$ent' (expected key: 'string', number, " +
                "list, or map)")
          }
        case other => throw new IllegalArgumentException(
          s"bad property-map entry '$other' (expected key: 'string', number, " +
            "list, or map)")
      }
    }
  }
  private val CondRe =
    """(\w+)(?:\.(\w+))?\s*(=|<>|>=|<=|>|<|CONTAINS|STARTS WITH|ENDS WITH)\s*(?:'([^']*)'|(-?\d+(?:\.\d+)?))""".r
  private val AggRe =
    """(?i)(count|sum|avg|min|max|collect|stDev|stDevP|percentileCont|percentileDisc|length|nodes|relationships)\s*\(\s*(DISTINCT\s+)?(?:(\*)|(toInteger|toFloat)\s*\(\s*(\w+)(?:\.(\w+))?\s*\)|(\w+)(?:\.(\w+))?)\s*(?:,\s*(-?\d+(?:\.\d+)?)\s*)?\)""".r

  // ---------------------------------------------------------------- parsing

  /** Recursive-descent WHERE parser: standard precedence (AND over
    * OR), parentheses, conditions from [[CondRe]]. Exposed as a class
    * so RETURN/WITH items can reuse the scalar-term grammar
    * ([[parseTerm]]) on their own cursor. */
  private[graph] def parseWhere(s: String, anon: () => String): Pred =
    new PredParser(s.trim, anon).parsePred()

  /** Parse-scoped COLLECT { … } bodies: masked behind `COLLECTSEGn`
    * identifier tokens before the clause regexes run (a COLLECT body
    * contains MATCH/RETURN keywords that would mis-split the clause
    * scanners — the CALLSEG precedent), resolved back in atomT().
    * ThreadLocal because PredParsers are built throughout the compile
    * and nested parses (CALL subquery parts) must see the outer
    * parse's tokens — hence buffer-indexed. Each run() truncates the
    * buffer back to its entry mark in a finally (r12): indices stay
    * valid for the whole dynamic extent of one compile, and long-lived
    * parser threads (a server reusing threads) no longer accumulate
    * masked bodies without bound. */
  private val collectBodies =
    new ThreadLocal[scala.collection.mutable.Buffer[String]] {
      override def initialValue(): scala.collection.mutable.Buffer[String] =
        scala.collection.mutable.Buffer.empty[String]
    }

  /** Mask every `COLLECT { … }` occurrence (quote-aware, brace-
    * balanced) behind a COLLECTSEGn token. */
  private def maskCollect(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    // regionMatches(ignoreCase), not an uppercased copy: locale-
    // expanding mappings ('ß' -> "SS") would desync copy offsets from
    // the original string and corrupt the masked text silently
    var i = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inQ && s.regionMatches(true, i, "COLLECT", 0, 7) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1)))) {
        var j = i + 7
        while (j < s.length && s.charAt(j) == ' ') j += 1
        if (j < s.length && s.charAt(j) == '{') {
          var depth = 1; var k = j + 1; var q2 = false
          while (k < s.length && depth > 0) {
            val ch = s.charAt(k)
            if (q2) { if (ch == '\'') q2 = false }
            else ch match {
              case '\'' => q2 = true
              case '{' => depth += 1
              case '}' => depth -= 1
              case _ => ()
            }
            k += 1
          }
          require(depth == 0, s"unbalanced COLLECT {{ in: $s")
          val buf = collectBodies.get()
          buf += s.substring(j + 1, k - 1).trim
          out.append("COLLECTSEG").append(buf.size - 1)
          i = k
        } else { out.append(c); i += 1 }
      } else {
        if (c == '\'') inQ = !inQ
        out.append(c); i += 1
      }
    }
    out.toString
  }

  /** AND-combine predicates, flattening nested Ands so downstream
    * conjunct routers (OPTIONAL MATCH per-chain filtering) see a flat
    * conjunct list. */
  private def andAll(ps: Seq[Pred]): Option[Pred] = {
    val flat = ps.flatMap { case And(xs) => xs; case p => Seq(p) }
    flat match {
      case Seq() => None
      case Seq(p) => Some(p)
      case many => Some(And(many))
    }
  }

  /** Split `<pattern> [WHERE <pred>]` at the first ` WHERE ` that sits
    * OUTSIDE quotes and outside any paren/bracket/brace nesting — an
    * inline pattern predicate `(n:L WHERE …)` or a quantifier /
    * COUNT{} body never splits here. */
  private def splitTopWhere(s: String): (String, Option[String]) =
    topLevelIndexOf(s, " WHERE ") match {
      case -1 => (s.trim, None)
      case i => (s.substring(0, i).trim, Some(s.substring(i + 7).trim))
    }

  /** First index of a ` KEYWORD `-shaped token (case-insensitive)
    * outside quotes and any paren/bracket/brace nesting; -1 if none. */
  private def topLevelIndexOf(s: String, kw: String): Int =
    topLevelIndexOf(s, kw, 0)

  private def topLevelIndexOf(s: String, kw: String, from: Int): Int = {
    // scan from 0 (quote/nesting state needs the full prefix), return
    // the first top-level hit at or after `from`
    var i = 0; var dp = 0; var db = 0; var dbr = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => dp += 1
        case ')' => dp -= 1
        case '[' => db += 1
        case ']' => db -= 1
        case '{' => dbr += 1
        case '}' => dbr -= 1
        case ' ' if i >= from && dp == 0 && db == 0 && dbr == 0 &&
            s.regionMatches(true, i, kw, 0, kw.length) =>
          return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** [[topLevelIndexOf]] for CLAUSE keywords: a ` WITH ` hit whose
    * preceding token is STARTS or ENDS is the tail of a string
    * operator (`x STARTS WITH 'p'`), not a WITH clause — skip it. */
  private def topLevelClauseIndexOf(s: String, kw: String): Int = {
    val isWith = kw.equalsIgnoreCase(" WITH ")
    var from = 0
    while (from <= s.length) {
      val i = topLevelIndexOf(s, kw, from)
      if (i < 0) return -1
      val stringOp = isWith && {
        val head = s.substring(0, i).trim
        val tokStart = {
          var j = head.length - 1
          while (j >= 0 && Character.isLetter(head.charAt(j))) j -= 1
          j + 1
        }
        val tok = head.substring(tokStart)
        tok.equalsIgnoreCase("STARTS") || tok.equalsIgnoreCase("ENDS")
      }
      if (!stringOp) return i
      from = i + 1
    }
    -1
  }

  /** Strip Cypher-5 INLINE PATTERN PREDICATES — `(n:L WHERE p)` /
    * `-[r:T WHERE p]->` — out of one chain's text. Returns the
    * stripped chain plus the extracted predicate texts (token order);
    * callers AND them into their clause predicate, which is exactly
    * Neo4j's semantics for inner MATCH, and the per-chain conjunct
    * router gives the pre-join semantics on OPTIONAL chains. Quote-
    * and nesting-aware: the predicate runs from the group's first
    * depth-0 WHERE to the group's close, so parenthesized predicates
    * and quantifier bodies survive intact. */
  private def stripInlineWheres(pattern: String): (String, Seq[String]) = {
    val sb = new java.lang.StringBuilder(pattern.length)
    val preds = scala.collection.mutable.Buffer.empty[String]
    var i = 0
    val n = pattern.length
    while (i < n) {
      val ch = pattern.charAt(i)
      if (ch == '(' || ch == '[') {
        val close = if (ch == '(') ')' else ']'
        var dp = 0; var db = 0; var dbr = 0; var inQ = false
        var wAt = -1; var end = -1
        var j = i + 1
        while (j < n && end < 0) {
          val c = pattern.charAt(j)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => dp += 1
            case '[' => db += 1
            case '{' => dbr += 1
            case '}' => dbr -= 1
            case ')' =>
              if (dp == 0 && db == 0 && dbr == 0 && close == ')') end = j else dp -= 1
            case ']' =>
              if (dp == 0 && db == 0 && dbr == 0 && close == ']') end = j else db -= 1
            case ' ' if dp == 0 && db == 0 && dbr == 0 && wAt < 0 &&
                pattern.regionMatches(true, j, " WHERE ", 0, 7) => wAt = j
            case _ => ()
          }
          j += 1
        }
        require(end > i, s"unbalanced '$ch' in pattern: $pattern")
        if (wAt > 0) {
          val pred = pattern.substring(wAt + 7, end).trim
          require(pred.nonEmpty, s"empty inline WHERE in pattern: $pattern")
          val stripped = pattern.substring(i, wAt)
          if (ch == '[')
            require(!hasTopLevelStar(stripped),
              "inline WHERE on a variable-length relationship is " +
                "unsupported (an inline property map applies per " +
                "traversed edge instead)")
          sb.append(stripped).append(close)
          preds += pred
        } else sb.append(pattern, i, end + 1)
        i = end + 1
      } else { sb.append(ch); i += 1 }
    }
    (sb.toString, preds.toSeq)
  }

  /** `*` at brace-depth 0 outside quotes — a var-length hop marker. */
  private def hasTopLevelStar(s: String): Boolean = {
    var inQ = false; var dbr = 0; var found = false
    var i = 0
    while (i < s.length && !found) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '{' => dbr += 1
        case '}' => dbr -= 1
        case '*' => if (dbr == 0) found = true
        case _ => ()
      }
      i += 1
    }
    found
  }

  private final class PredParser(var rest: String,
                                 // fresh names per parser — a CONSTANT default would make two
                                 // anonymous nodes in one pattern collide into a repeated-
                                 // variable equality join
                                 anon: () => String = { var i = 0; () => { i += 1; s"_eanon$i" } }) {
    def ws(): Unit = { rest = rest.dropWhile(_ == ' ') }
    def eat(tok: String): Boolean = {
      ws()
      if (rest.regionMatches(true, 0, tok, 0, tok.length) &&
          (rest.length == tok.length || !Character.isLetterOrDigit(rest.charAt(tok.length)) ||
           !Character.isLetter(tok.last))) {
        rest = rest.substring(tok.length); true
      } else false
    }
    // ---- scalar terms (for the general-comparison fallback) ----
    val NumRe = """-?\d+(?:\.\d+)?""".r
    val IdRe = """(\w+)(?:\.(\w+))?""".r
    val CountBrace = """(?i)^COUNT\s*\{""".r
    val CollectBrace = """(?i)^COLLECT\s*\{""".r
    val CollectSegRe = """^COLLECTSEG(\d+)\b""".r

    /** Cypher 5 COLLECT { [MATCH] <pattern> [WHERE <pred>] RETURN
      * [DISTINCT] <expr> } subquery — the list-building sibling of
      * COUNT{}/EXISTS{}, compiled onto the pattern-comprehension shape
      * (sorted list, [] empty-fill — this engine's deterministic
      * order; an inner ORDER BY is a loud error, not a silently
      * different order). `inner` is the brace body. */
    def collectTerm(inner: String): Term = {
      Seq(" ORDER BY ", " WITH ", " UNWIND ", " UNION ").foreach { kw =>
        require(topLevelClauseIndexOf(inner, kw) < 0,
          s"COLLECT {{ }} supports the MATCH … WHERE … RETURN <expr> form " +
            s"only (found${kw}— lists come back SORTED by this engine's " +
            "deterministic-order rule)")
      }
      val rAt = topLevelIndexOf(inner, " RETURN ")
      require(rAt >= 0 || inner.toUpperCase.startsWith("RETURN "),
        s"COLLECT {{ }} needs a RETURN <expr>: $inner")
      require(rAt >= 0, s"COLLECT {{ }} needs a pattern before RETURN: $inner")
      val head0 = inner.substring(0, rAt).trim
      var retText = inner.substring(rAt + 8).trim
      val pcDistinct = retText.toUpperCase.startsWith("DISTINCT ")
      if (pcDistinct) retText = retText.substring(9).trim
      val head = if (head0.toUpperCase.startsWith("MATCH ")) head0.substring(6).trim
                 else head0
      val (patText, wText) = splitTopWhere(head)
      val (chain, inl) = parsePatternChainW(patText, anon)
      val innerWhere =
        andAll(wText.toSeq.map(t => new PredParser(t, anon).parsePred()) ++
          inl.map(parseWhere(_, anon)))
      val save = rest
      rest = retText
      val proj = sumT(); ws()
      require(rest.isEmpty,
        s"COLLECT {{ }} RETURN must be a single expression, got trailing: $rest")
      rest = save
      PatCompT(chain, innerWhere, proj, pcDistinct)
    }
    /** Consume a `{ … }` subquery body (cursor just past the opening
      * brace): scan for the MATCHING close with a depth counter,
      * skipping string literals (an inner WHERE may compare against
      * '}'-containing strings); strip an optional leading MATCH; split
      * at the first top-level WHERE. Returns (chain, innerWhere). */
    def braceSubquery(kw: String): ((Seq[NodePat], Seq[EdgePat]), Option[Pred]) = {
      var depth = 1
      var i = 0
      while (i < rest.length && depth > 0) {
        rest.charAt(i) match {
          case '{' => depth += 1
          case '}' => depth -= 1
          case '\'' =>
            val e = rest.indexOf('\'', i + 1)
            require(e > 0, s"unterminated string in $kw {{ at: $rest")
            i = e
          case _ => ()
        }
        i += 1
      }
      require(depth == 0, s"unbalanced $kw {{ at: $rest")
      var inner = rest.substring(0, i - 1).trim
      rest = rest.substring(i)
      if (inner.toUpperCase.startsWith("MATCH ")) inner = inner.substring(6).trim
      // first TOP-LEVEL WHERE splits pattern from predicate (an inline
      // `(n WHERE …)` sits inside parens and stays with the pattern —
      // it merges into the returned predicate below)
      val (patText, wText) = splitTopWhere(inner)
      val (chain, inl) = parsePatternChainW(patText, anon)
      (chain, andAll(wText.toSeq.map(t => new PredParser(t, anon).parsePred()) ++
        inl.map(parseWhere(_, anon))))
    }

    def atomT(): Term = {
      ws()
      if (CountBrace.findPrefixMatchOf(rest).isDefined) {
        // Cypher 5 COUNT { [MATCH] <pattern> [WHERE <pred>] } subquery —
        // sugar over the size(<pattern>) pattern-count term; the inner
        // WHERE filters pattern matches before counting
        val m = CountBrace.findPrefixMatchOf(rest).get
        rest = rest.substring(m.end)
        val (chain, innerWhere) = braceSubquery("COUNT")
        SizePat(chain, innerWhere)
      } else if (CollectSegRe.findPrefixMatchOf(rest).isDefined) {
        // a COLLECT { … } body masked by parse() — resolve and compile
        val m = CollectSegRe.findPrefixMatchOf(rest).get
        rest = rest.substring(m.end)
        collectTerm(collectBodies.get()(m.group(1).toInt))
      } else if (CollectBrace.findPrefixMatchOf(rest).isDefined) {
        // raw (unmasked) spelling — texts that never went through
        // parse()'s masking, e.g. CALL-tail predicates
        val m = CollectBrace.findPrefixMatchOf(rest).get
        rest = rest.substring(m.end)
        var depth = 1; var i = 0
        while (i < rest.length && depth > 0) {
          rest.charAt(i) match {
            case '{' => depth += 1
            case '}' => depth -= 1
            case '\'' =>
              val e = rest.indexOf('\'', i + 1)
              require(e > 0, s"unterminated string in COLLECT {{ at: $rest")
              i = e
            case _ => ()
          }
          i += 1
        }
        require(depth == 0, s"unbalanced COLLECT {{ at: $rest")
        val inner = rest.substring(0, i - 1).trim
        rest = rest.substring(i)
        collectTerm(inner)
      } else if (rest.startsWith("[")) {
        rest = rest.substring(1)
        ws()
        // pattern comprehension probe: a node pattern followed by an
        // edge token right after the '[' — [(a)-[:T]->(x) … | expr]
        val pcProbe = """^\((?:[^()']|'[^']*')*\)\s*(?:<-|-)\[""".r
        if (pcProbe.findPrefixMatchOf(rest).isDefined) {
          // matching ']' (the edge tokens nest one bracket deep)
          var i = 0; var depth = 1; var inStr = false
          while (i < rest.length && depth > 0) {
            rest.charAt(i) match {
              case '\'' => inStr = !inStr
              case '[' if !inStr => depth += 1
              case ']' if !inStr => depth -= 1
              case _ => ()
            }
            i += 1
          }
          require(depth == 0, s"unbalanced pattern comprehension at: $rest")
          val inner = rest.substring(0, i - 1).trim
          val after = rest.substring(i)
          // first top-level '|' separates pattern [WHERE] from the
          // mandatory projection (edge-pattern '|'s sit inside
          // brackets, never at depth 0)
          var j = 0; var d2 = 0; var s2 = false; var bar = -1
          while (j < inner.length && bar < 0) {
            inner.charAt(j) match {
              case '\'' => s2 = !s2
              case '[' | '(' | '{' if !s2 => d2 += 1
              case ']' | ')' | '}' if !s2 => d2 -= 1
              case '|' if !s2 && d2 == 0 => bar = j
              case _ => ()
            }
            j += 1
          }
          require(bar >= 0,
            s"pattern comprehension needs a '| <expr>' projection: [$inner]")
          val patPart = inner.substring(0, bar).trim
          val projText = inner.substring(bar + 1).trim
          // optional inner WHERE (top-level split, the COUNT{} rule;
          // inline `(n WHERE …)` predicates merge in)
          val (patText, wText) = splitTopWhere(patPart)
          val (chain, inl) = parsePatternChainW(patText, anon)
          val innerWhere =
            andAll(wText.toSeq.map(t => new PredParser(t, anon).parsePred()) ++
              inl.map(parseWhere(_, anon)))
          // nested term parse over the projection's own text
          rest = projText
          val proj = sumT(); ws()
          require(rest.isEmpty,
            s"trailing input in pattern comprehension projection: $rest")
          rest = after
          return PatCompT(chain, innerWhere, proj)
        }
        val CompHead = """(?i)^(\w+)\s+IN\b""".r
        CompHead.findPrefixMatchOf(rest) match {
          case Some(m) =>
            // list comprehension [x IN xs [WHERE p] [| e]]
            val cv = m.group(1)
            rest = rest.substring(m.end)
            val src = sumT(); ws()
            val wh = if (eat("WHERE")) Some(orExpr()) else None
            ws()
            val proj = if (rest.startsWith("|")) {
              rest = rest.substring(1); Some(sumT())
            } else None
            ws()
            require(rest.startsWith("]"), s"expected ']' after comprehension at: $rest")
            rest = rest.substring(1)
            CompT(cv, src, wh, proj)
          case None =>
            // literal list — elements are full scalar terms
            val elems = scala.collection.mutable.Buffer.empty[Term]
            if (!rest.startsWith("]")) {
              elems += sumT(); ws()
              while (rest.startsWith(",")) {
                rest = rest.substring(1); elems += sumT(); ws()
              }
            }
            require(rest.startsWith("]"), s"expected ']' in list at: $rest")
            rest = rest.substring(1)
            ListT(elems.toSeq)
        }
      } else if (eat("CASE")) {
        // searched CASE: WHEN <pred> THEN <term> … [ELSE <term>] END
        // simple CASE:   CASE <subject> WHEN <value> THEN … — desugars
        // to searched CASE with `subject = value` branch predicates.
        // Mixing is structurally impossible: with a subject every WHEN
        // parses a TERM (a predicate there is a loud 'expected THEN'),
        // without one every WHEN parses a predicate.
        ws()
        val subject: Option[Term] =
          if ("""(?i)^WHEN\b""".r.findPrefixMatchOf(rest).isDefined) None
          else Some(sumT())
        val branches = scala.collection.mutable.Buffer.empty[(Pred, Term)]
        while (eat("WHEN")) {
          val p = subject match {
            case Some(s) => CmpLeaf(s, "=", sumT())
            case None => orExpr()
          }
          require(eat("THEN"), s"expected THEN at: $rest")
          branches += ((p, sumT()))
        }
        require(branches.nonEmpty, s"CASE needs at least one WHEN at: $rest")
        val els = if (eat("ELSE")) Some(sumT()) else None
        require(eat("END"), s"expected END at: $rest")
        CaseT(branches.toSeq, els)
      } else if (rest.startsWith("(")) {
        rest = rest.substring(1)
        val t = sumT()
        ws()
        require(rest.startsWith(")"), s"expected ')' in expression at: $rest")
        rest = rest.substring(1)
        t
      } else if (rest.startsWith("'")) {
        val e = rest.indexOf('\'', 1)
        require(e > 0, s"unterminated string at: $rest")
        val v = rest.substring(1, e); rest = rest.substring(e + 1)
        StrT(v)
      } else NumRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          rest = rest.substring(m.end); NumT(m.matched.toDouble)
        case None => IdRe.findPrefixMatchOf(rest) match {
          case Some(m) if m.group(1).equalsIgnoreCase("coalesce")
              && m.group(2) == null && rest.substring(m.end).trim.startsWith("(") =>
            rest = rest.substring(rest.indexOf('(', m.end) + 1)
            val args = scala.collection.mutable.Buffer(sumT())
            ws()
            while (rest.startsWith(",")) {
              rest = rest.substring(1); args += sumT(); ws()
            }
            require(rest.startsWith(")"), s"expected ')' after coalesce at: $rest")
            rest = rest.substring(1)
            CoalesceT(args.toSeq)
          case Some(m) if m.group(1).equalsIgnoreCase("reduce")
              && m.group(2) == null && rest.substring(m.end).trim.startsWith("(") =>
            // reduce(acc = init, x IN xs | expr)
            rest = rest.substring(rest.indexOf('(', m.end) + 1)
            ws()
            val AccRe = """^(\w+)\s*=""".r
            val am = AccRe.findPrefixMatchOf(rest).getOrElse(
              throw new IllegalArgumentException(s"reduce needs 'acc = init' at: $rest"))
            val accName = am.group(1)
            rest = rest.substring(am.end)
            val init = sumT(); ws()
            require(rest.startsWith(","), s"expected ',' after reduce init at: $rest")
            rest = rest.substring(1); ws()
            val VarRe = """(?i)^(\w+)\s+IN\b""".r
            val vm = VarRe.findPrefixMatchOf(rest).getOrElse(
              throw new IllegalArgumentException(s"reduce needs 'x IN xs' at: $rest"))
            val vName = vm.group(1)
            rest = rest.substring(vm.end)
            val src = sumT(); ws()
            require(rest.startsWith("|"), s"expected '|' before reduce expression at: $rest")
            rest = rest.substring(1)
            val expr = sumT(); ws()
            require(rest.startsWith(")"), s"expected ')' after reduce at: $rest")
            rest = rest.substring(1)
            ReduceT(accName, init, vName, src, expr)
          case Some(m) if m.group(1).equalsIgnoreCase("range")
              && m.group(2) == null && rest.substring(m.end).trim.startsWith("(") =>
            rest = rest.substring(rest.indexOf('(', m.end) + 1)
            val a = sumT(); ws()
            require(rest.startsWith(","), s"range(a, b) needs two arguments at: $rest")
            rest = rest.substring(1)
            val b = sumT(); ws()
            require(rest.startsWith(")"), s"expected ')' after range at: $rest")
            rest = rest.substring(1)
            RangeT(a, b)
          case Some(m) if Set("toInteger", "toFloat", "toBoolean", "toLower", "toUpper", "size",
                "labels", "keys", "properties", "head", "last",
                "date", "datetime", "timestamp", "duration", "type", "id", "elementId",
                "startNode", "endNode", "length", "nodes", "relationships",
                "trim", "ltrim", "rtrim", "toString",
                "abs", "round", "floor", "ceil", "sqrt", "sign")(m.group(1))
              && m.group(2) == null && rest.substring(m.end).trim.startsWith("(") =>
            rest = rest.substring(rest.indexOf('(', m.end) + 1)
            // Neo4j-5 elementId() is this engine's id() (ids ARE the
            // element identity here — no internal numeric ids)
            val fn = m.group(1).toLowerCase match {
              case "elementid" => "id"
              case f => f
            }
            // size(<pattern>) — the inline-degree idiom: the argument is
            // a chain, not a scalar (a node group followed by a hop)
            val isPatternArg = fn == "size" && {
              ws()
              NodeRe.findPrefixMatchOf(rest) match {
                case Some(nm) =>
                  val after = rest.substring(nm.end).trim
                  after.startsWith("-[") || after.startsWith("<-[")
                case None => false
              }
            }
            if (isPatternArg) {
              // consume up to the size(...) call's balanced close
              var depth = 1
              var i = 0
              while (i < rest.length && depth > 0) {
                rest.charAt(i) match {
                  case '(' => depth += 1
                  case ')' => depth -= 1
                  case _ => ()
                }
                i += 1
              }
              require(depth == 0, s"unbalanced size(<pattern>) at: $rest")
              val inner = rest.substring(0, i - 1).trim
              rest = rest.substring(i)
              val (szChain, szInl) = parsePatternChainW(inner, anon)
              SizePat(szChain, andAll(szInl.map(parseWhere(_, anon))))
            } else if (fn == "duration" && { ws(); rest.startsWith("{") }) {
              // duration({years: 1, months: 2, days: 3, hours: 4, …}) —
              // the Cypher map form, normalized to the ISO-8601 string
              // the compiler already handles
              val close = rest.indexOf('}')
              require(close > 0, s"unbalanced duration({{ at: $rest")
              val body = rest.substring(1, close)
              rest = rest.substring(close + 1); ws()
              require(rest.startsWith(")"), s"expected ')' after duration at: $rest")
              rest = rest.substring(1)
              val kv = """(\w+)\s*:\s*(-?\d+)""".r
                .findAllMatchIn(body).map(m => m.group(1).toLowerCase -> m.group(2).toLong).toMap
              val bad = kv.keySet -- Set("years", "months", "weeks", "days",
                "hours", "minutes", "seconds")
              require(bad.isEmpty, s"duration() map: unknown components ${bad.mkString(", ")}")
              def part(k: String, u: String): String =
                kv.get(k).filter(_ != 0).map(v => s"$v$u").getOrElse("")
              val datePart = part("years", "Y") + part("months", "M") +
                part("weeks", "W") + part("days", "D")
              val timePart = part("hours", "H") + part("minutes", "M") + part("seconds", "S")
              val iso = "P" + datePart + (if (timePart.nonEmpty) "T" + timePart else "") match {
                case "P" => "PT0S"
                case ok => ok
              }
              FuncT("duration", StrT(iso))
            } else {
              val inner = sumT()
              ws()
              // round(value, precision) — Neo4j's 2-arg spelling
              if (fn == "round" && rest.startsWith(",")) {
                rest = rest.substring(1)
                val prec = sumT(); ws()
                require(rest.startsWith(")"), s"expected ')' after round at: $rest")
                rest = rest.substring(1)
                FuncN("round", Seq(inner, prec))
              } else {
                require(rest.startsWith(")"), s"expected ')' after ${m.group(1)} at: $rest")
                rest = rest.substring(1)
                if (fn == "tointeger" || fn == "tofloat" || fn == "toboolean") CastT(fn, inner)
                else FuncT(fn, inner)
              }
            }
          case Some(m) if Set("split", "replace", "substring", "left", "right")(m.group(1))
              && m.group(2) == null && rest.substring(m.end).trim.startsWith("(") =>
            rest = rest.substring(rest.indexOf('(', m.end) + 1)
            val args = scala.collection.mutable.Buffer(sumT())
            ws()
            while (rest.startsWith(",")) {
              rest = rest.substring(1); args += sumT(); ws()
            }
            require(rest.startsWith(")"), s"expected ')' after ${m.group(1)} at: $rest")
            rest = rest.substring(1)
            FuncN(m.group(1).toLowerCase, args.toSeq)
          case Some(m) =>
            rest = rest.substring(m.end)
            // map projection: `n {.a, .b}` / `n {.*}` — only a brace
            // directly followed by a '.' item activates (no other
            // term-position '{' exists, but stay conservative)
            if (m.group(2) == null &&
                """^\s*\{\s*\.""".r.findPrefixMatchOf(rest).isDefined) {
              val close = rest.indexOf('}')
              require(close > 0, s"unbalanced map projection at: $rest")
              val body = rest.substring(rest.indexOf('{') + 1, close).trim
              rest = rest.substring(close + 1)
              var star = false
              val props = scala.collection.mutable.Buffer.empty[String]
              body.split(",").map(_.trim).filter(_.nonEmpty).foreach {
                case ".*" => star = true
                case it if it.startsWith(".") && it.substring(1).matches("\\w+") =>
                  props += it.substring(1)
                case other => throw new IllegalArgumentException(
                  s"bad map-projection item '$other' (expected .prop or .*)")
              }
              require(!(star && props.nonEmpty),
                "map projection cannot mix .* with listed properties")
              MapProjT(m.group(1), props.toSeq, star)
            } else PropT(m.group(1), Option(m.group(2)))
          case None => throw new IllegalArgumentException(s"bad term at: $rest")
        }
      }
    }
    /** Postfix list subscripts after any atom: `xs[0]` (element) and
      * `xs[a..b]` (slice, either bound omissible) — chainable
      * (`m[0..2][0]`). A '[' in ATOM position stays a literal list /
      * pattern comprehension; only the postfix position subscripts. */
    def postT(): Term = {
      var t = atomT(); ws()
      val SliceRe = """^\[\s*(-?\d+)?\s*\.\.\s*(-?\d+)?\s*\]""".r
      val IdxRe = """^\[\s*(-?\d+)\s*\]""".r
      var go = true
      while (go) {
        SliceRe.findPrefixMatchOf(rest) match {
          case Some(m) =>
            rest = rest.substring(m.end)
            t = SliceT(t, Option(m.group(1)).map(_.toInt),
              Option(m.group(2)).map(_.toInt))
          case None => IdxRe.findPrefixMatchOf(rest) match {
            case Some(m) =>
              rest = rest.substring(m.end)
              t = IndexT(t, m.group(1).toInt)
            case None => go = false
          }
        }
        if (go) ws()
      }
      t
    }
    def prodT(): Term = {
      var t = postT(); ws()
      while (rest.startsWith("*") || rest.startsWith("/") || rest.startsWith("%")) {
        val op = rest.substring(0, 1); rest = rest.substring(1)
        t = ArithT(op, t, postT()); ws()
      }
      t
    }
    def sumT(): Term = {
      var t = prodT(); ws()
      while (rest.startsWith("+") || rest.startsWith("-")) {
        val op = rest.substring(0, 1); rest = rest.substring(1)
        t = ArithT(op, t, prodT()); ws()
      }
      t
    }
    def cmpLeaf(): Pred = {
      val l = sumT(); ws()
      if (eat("IS NOT NULL")) NullLeaf(l, isNull = false)
      else if (eat("IS NULL")) NullLeaf(l, isNull = true)
      else if (eat("IN")) { ws(); InPred(l, atomT()) }
      else {
        val ops = Seq(">=", "<=", "<>", "=~", "=", ">", "<",
          "STARTS WITH", "ENDS WITH", "CONTAINS")
        val op = ops.find(o => rest.regionMatches(true, 0, o, 0, o.length))
          .getOrElse(throw new IllegalArgumentException(s"expected comparison at: $rest"))
        rest = rest.substring(op.length)
        CmpLeaf(l, op.toUpperCase, sumT())
      }
    }
    /** `exists( <pattern> )`: consume the balanced parens and parse the
      * inner text as a linear pattern chain. */
    def existsPat(): Pred = {
      val open = rest.indexOf('(')
      var depth = 0
      var close = -1
      var i = open
      while (i < rest.length && close < 0) {
        rest.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ => ()
        }
        i += 1
      }
      require(close > open, s"unbalanced exists(...) at: $rest")
      val inner = rest.substring(open + 1, close).trim
      rest = rest.substring(close + 1)
      val (chain, inl) = parsePatternChainW(inner, anon)
      ExistsPat(chain, chain._1.head.v, andAll(inl.map(parseWhere(_, anon))))
    }
    val QuantHead = """(?i)^(any|all|none|single)\s*\(\s*(\w+)\s+IN\b""".r
    // label test: a bare identifier immediately followed by ':' and a
    // label expression — nothing else in predicate-atom position
    // starts that way (map literals live in term/pattern contexts)
    val LabelTestRe = """^(\w+)\s*:\s*([\w|&!]+)""".r
    val ExistsBrace = """(?i)^EXISTS\s*\{""".r
    /** One-hop lookahead for a BARE pattern predicate — `(p)-[:T]->(x)`
      * in predicate position (Neo4j sugar for exists(...)). The full
      * first hop must be visible so parenthesized arithmetic like
      * `(c) - 1 > 0` (no `[`/`->`/`-(` after the dash) never matches. */
    val PatHead = ("""^\(\s*\w*(?:\s*:\s*\w+)?(?:\s*""" + PropsMap +
      """)?\s*\)\s*(?:<-|-)\s*(?:\[(?:[^\]']|'[^']*')*\]\s*)?(?:->|-)\s*\(""").r
    /** Scan for the first unquoted occurrence of `ch`; -1 if none —
      * property-map string literals may contain ')' / ']'. */
    def unquotedIndexOf(s: String, ch: Char): Int = {
      var i = 0; var inQ = false
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\'') inQ = !inQ
        else if (c == ch && !inQ) return i
        i += 1
      }
      -1
    }
    /** Drop whitespace OUTSIDE string literals only (a blanket
      * replaceAll would mangle `{image: 'a b'}` into 'ab'). */
    def stripWsOutsideQuotes(s: String): String = {
      val sb = new StringBuilder
      var inQ = false
      s.foreach { c =>
        if (c == '\'') { inQ = !inQ; sb += c }
        else if (inQ || !c.isWhitespace) sb += c
      }
      sb.toString
    }
    /** Consume a linear pattern chain (node, then `-[..]->` hops) from
      * the cursor, returning its text with whitespace normalized away
      * (the chain mini-grammar is whitespace-free outside string
      * literals). */
    def consumePattern(): String = {
      val sb = new StringBuilder
      def node(): Unit = {
        ws()
        require(rest.startsWith("("), s"expected '(' in pattern at: $rest")
        val close = unquotedIndexOf(rest, ')')
        require(close > 0, s"unbalanced node pattern at: $rest")
        sb ++= stripWsOutsideQuotes(rest.substring(0, close + 1))
        rest = rest.substring(close + 1)
      }
      node()
      var more = true
      while (more) {
        ws()
        if (rest.startsWith("<-") || rest.startsWith("-")) {
          if (rest.startsWith("<-")) { sb ++= "<-"; rest = rest.substring(2) }
          else { sb ++= "-"; rest = rest.substring(1) }
          ws()
          if (rest.startsWith("[")) {
            val close = unquotedIndexOf(rest, ']')
            require(close > 0, s"unbalanced [..] in pattern at: $rest")
            sb ++= stripWsOutsideQuotes(rest.substring(0, close + 1))
            rest = rest.substring(close + 1)
            ws()
          }
          if (rest.startsWith("->")) { sb ++= "->"; rest = rest.substring(2) }
          else {
            require(rest.startsWith("-"), s"expected '->' or '-' in pattern at: $rest")
            sb ++= "-"; rest = rest.substring(1)
          }
          node()
        } else more = false
      }
      sb.toString
    }
    def factor(): Pred = {
      ws()
      if (eat("NOT")) Not(factor())
      else if (ExistsBrace.findPrefixMatchOf(rest).isDefined) {
        // Cypher 5 existential subquery
        // EXISTS { [MATCH] <pattern> [WHERE <pred>] } — sugar over the
        // pattern predicate; the inner WHERE filters the matches that
        // witness existence (it may reference pattern variables)
        val m = ExistsBrace.findPrefixMatchOf(rest).get
        rest = rest.substring(m.end)
        val (chain, innerWhere) = braceSubquery("EXISTS")
        ExistsPat(chain, chain._1.head.v, innerWhere)
      } else if (rest.toLowerCase.startsWith("exists") &&
          rest.substring(6).trim.startsWith("(")) {
        rest = rest.substring(6)
        existsPat()
      } else if (PatHead.findPrefixMatchOf(rest).isDefined) {
        // bare pattern predicate: Neo4j's `WHERE (p)-[:T]->(x)` is
        // sugar for exists((p)-[:T]->(x)); `NOT (p)-[:T]->()` composes
        // through the NOT branch above into the anti shape
        val (chain, inl) = parsePatternChainW(consumePattern(), anon)
        ExistsPat(chain, chain._1.head.v, andAll(inl.map(parseWhere(_, anon))))
      } else if (LabelTestRe.findPrefixMatchOf(rest).isDefined) {
        // Neo4j label test `n:Label` (full label expressions allowed)
        val m = LabelTestRe.findPrefixMatchOf(rest).get
        rest = rest.substring(m.end)
        LabelPred(m.group(1), m.group(2))
      } else if (QuantHead.findPrefixMatchOf(rest).isDefined) {
        // any/all/none/single(x IN xs WHERE p)
        val m = QuantHead.findPrefixMatchOf(rest).get
        val (q, qv) = (m.group(1).toLowerCase, m.group(2))
        rest = rest.substring(m.end)
        val src = sumT(); ws()
        require(eat("WHERE"), s"$q(x IN xs WHERE …) needs a WHERE at: $rest")
        val p = orExpr(); ws()
        require(rest.startsWith(")"), s"expected ')' after $q at: $rest")
        rest = rest.substring(1)
        QuantPred(q, qv, src, p)
      } else if (rest.startsWith("(")) {
        // ambiguous: parenthesized predicate OR parenthesized arithmetic
        // ("(r.x + 1) > 2") — try the predicate read, backtrack to a
        // comparison on failure
        val save = rest
        try {
          rest = rest.substring(1)
          val p = orExpr()
          ws()
          require(rest.startsWith(")"), s"expected ')' at: $rest")
          rest = rest.substring(1)
          p
        } catch { case _: Exception => rest = save; cmpLeaf() }
      } else CondRe.findPrefixMatchOf(rest) match {
        // fast path: ref-vs-literal — but not if what follows is an
        // arithmetic operator (then the literal was a sub-term:
        // "a.x = 1 + 1" must go to the general parser)
        case Some(m) if {
          val tail = rest.substring(m.end).trim
          tail.isEmpty || "+-*/".indexOf(tail.head) < 0
        } =>
          rest = rest.substring(m.end)
          val numeric = m.group(5) != null
          Leaf(Cond(m.group(1), Option(m.group(2)), m.group(3).toUpperCase,
            if (numeric) m.group(5) else m.group(4), numeric))
        case _ => cmpLeaf()
      }
    }
    def andExpr(): Pred = {
      val ps = scala.collection.mutable.Buffer(factor())
      while (eat("AND")) ps += factor()
      if (ps.size == 1) ps.head else And(ps.toSeq)
    }
    def orExpr(): Pred = {
      val ps = scala.collection.mutable.Buffer(andExpr())
      while (eat("OR")) ps += andExpr()
      if (ps.size == 1) ps.head else Or(ps.toSeq)
    }
    def parsePred(): Pred = {
      val p = orExpr()
      ws()
      require(rest.isEmpty, s"trailing WHERE content: $rest")
      p
    }

    def parseTerm(): Term = {
      val t = sumT()
      ws()
      require(rest.isEmpty, s"trailing expression content: $rest")
      t
    }
  }

  /** Split a RETURN/WITH item list on TOP-LEVEL commas only — commas
    * inside parentheses/brackets/quotes (`coalesce(a, b)`,
    * `collect(...)`, `[1, 2]`) belong to their item. */
  private[graph] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inQ = false
    s.foreach {
      case '\'' => inQ = !inQ; sb += '\''
      case c @ ('(' | '[' | '{') if !inQ => depth += 1; sb += c
      case c @ (')' | ']' | '}') if !inQ => depth -= 1; sb += c
      case ',' if depth == 0 && !inQ => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private[graph] def parseRetItem(s0: String): RetItem = {
    val (s, alias) = s0.trim.split("(?i)\\s+AS\\s+") match {
      case Array(body) => (body.trim, None)
      case Array(body, a) => (body.trim, Some(a.trim))
      case _ => throw new IllegalArgumentException(s"bad item: $s0")
    }
    alias.foreach(a => require(a.matches("\\w+"), s"bad alias: $a"))
    s match {
      case AggRe(f, dist, star, castFn, cv, cp, v, p, pctOrNull) =>
        val fn = f.toLowerCase
        val ad = dist != null
        if (ad) require(Set("count", "sum", "min", "max", "collect")(fn),
          s"DISTINCT not supported inside $fn(...)")
        val isPct = fn == "percentilecont" || fn == "percentiledisc"
        require(isPct == (pctOrNull != null),
          if (isPct) s"$fn(expr, p) needs a literal percentile in [0, 1]"
          else s"$fn() takes one argument")
        val pct = Option(pctOrNull).map(_.toDouble)
        pct.foreach(x => require(x >= 0.0 && x <= 1.0,
          s"$fn percentile must be in [0, 1], got $x"))
        if (star != null) {
          require(fn == "count", s"$fn(*) not supported")
          require(!ad, "count(DISTINCT *) is not Cypher; name a variable")
          RetItem(Some("count"), "*", None, None, alias)
        } else if (castFn != null)
          RetItem(Some(fn), cv, Option(cp), Some(castFn.toLowerCase), alias,
            adistinct = ad, aggArg = pct)
        else RetItem(Some(fn), v, Option(p), None, alias, adistinct = ad, aggArg = pct)
      case AggExprRe(f, dist, inner) if parsesAsTerm(inner) =>
        // aggregate over a scalar EXPRESSION ("sum(toInteger(r.dport)
        // * 2) AS s") — the ref/cast forms are handled by AggRe above
        require(alias.isDefined, s"aggregate over an expression needs AS <alias>: $s")
        RetItem(Some(f.toLowerCase), "", None, None, alias,
          Some(new PredParser(inner.trim).parseTerm()), adistinct = dist != null)
      case r => r.split("\\.") match {
        // a masked COLLECT{} token is a TERM, never a variable ref
        case Array(v) if v.matches("\\w+") && !v.matches("COLLECTSEG\\d+") =>
          RetItem(None, v, None, None, alias)
        case Array(v, p) if v.matches("\\w+") && p.matches("\\w+") =>
          RetItem(None, v, Some(p), None, alias)
        case _ =>
          // general scalar expression ("toInteger(r.dport) * 2 AS x") —
          // same term grammar as WHERE; an alias is required (Cypher
          // auto-names expressions; here output naming stays explicit)
          val t = new PredParser(r).parseTerm()
          require(alias.isDefined, s"expression item needs AS <alias>: $r")
          RetItem(None, "", None, None, alias, Some(t))
      }
    }
  }

  private val AggExprRe = """(?i)(count|sum|avg|min|max|collect)\s*\(\s*(DISTINCT\s+)?(.*)\)""".r
  private def parsesAsTerm(s: String): Boolean =
    try { new PredParser(s.trim).parseTerm(); true }
    catch { case _: Exception => false }

  private[graph] def parseOrder(orderOrNull: String): Seq[(String, Boolean)] =
    Option(orderOrNull).toSeq.flatMap(splitTopLevel).map { o =>
      val t = o.trim
      val desc = t.toUpperCase.endsWith(" DESC")
      val body = t.replaceAll("(?i)\\s+(DESC|ASC)$", "")
      (parseRetItem(body).outName, desc)
    }

  /** Parse the pattern section of one MATCH stage: main chains
    * followed by any number of OPTIONAL MATCH chains, with the
    * connectivity and bound-head checks. `outerVars` are variables
    * already bound by a previous stage (WITH carries). */
  /** Parse one linear node-chain pattern ("(a:L)-[:T]->(b)") — shared
    * by MATCH stages and exists() pattern predicates. */
  private def parsePatternChain(pattern: String,
                                anon: () => String): (Seq[NodePat], Seq[EdgePat]) =
    parsePatternChainW(pattern, anon) match {
      case (chain, Seq()) => chain
      case _ => throw new IllegalArgumentException(
        s"inline WHERE is not supported in this pattern position: $pattern")
    }

  private val HopTok = """-\[(?:[^\]']|'[^']*')*\]->|<-\[(?:[^\]']|'[^']*')*\]-"""
  // \s* before the quantifier: `-[:T]-> {1,2}` and `-> +` are the same
  // QPP as the adjacent spelling — without it the chain regexes would
  // silently drop the stray quantifier text (a plain single hop plus
  // ignored junk), violating the loud-or-exact rule
  private val QppHopRe = (s"""($HopTok)\\s*(?:\\{(\\d+)(?:,(\\d*))?\\}|(\\+))""").r
  private val QppGroupRe = (s"""\\(\\(\\)($HopTok)\\(\\)\\)\\s*(?:\\{(\\d+)(?:,(\\d*))?\\}|(\\+))""").r

  /** Cypher-5 QUANTIFIED PATH PATTERNS, the desugarable subset: the
    * postfix-quantified hop `-[:T]->+` / `-[:T]->{m,n}` / `-[:T]->{m}`
    * and the anonymous group forms `(()-[:T]->()){m,n}` / `+` rewrite
    * to the engine's var-length hop `-[:T*m..n]->` (`+` and an open
    * `{m,}` take the path surface's 10-hop ceiling). Everything the
    * rewrite cannot express is LOUD, never silently different: bound
    * or constrained inner nodes and multi-hop bodies (their node-
    * unification semantics do not reduce to a var-length hop), and
    * zero-repetition quantifiers (a 0-length path binds no
    * relationship — this engine's hops start at 1). */
  private def desugarQpp(pattern0: String): String = {
    def bounds(lo: String, hiOrNull: String, plusOrNull: String): (Int, Int) = {
      if (plusOrNull != null) (1, 10)
      else {
        val l = lo.toInt
        val h = hiOrNull match {
          case null => l // {m} = exactly m
          case "" => 10 // {m,} = m up to the path ceiling
          case s => s.toInt
        }
        require(l >= 1,
          "zero-repetition quantified path patterns are unsupported " +
            "(a 0-length path binds no relationship)")
        (l, h)
      }
    }
    def rewriteHop(hop: String, lo: Int, hi: Int): String = {
      val close = hop.lastIndexOf(']')
      val body = hop.substring(hop.indexOf('[') + 1, close)
      require(!hasTopLevelStar(body),
        s"cannot quantify an already variable-length hop: $hop")
      java.util.regex.Matcher.quoteReplacement(
        hop.substring(0, close) + s"*$lo..$hi" + hop.substring(close))
    }
    val grouped = QppGroupRe.replaceAllIn(pattern0, m => {
      val (lo, hi) = bounds(m.group(2), m.group(3), m.group(4))
      rewriteHop(m.group(1), lo, hi)
    })
    val out = QppHopRe.replaceAllIn(grouped, m => {
      val (lo, hi) = bounds(m.group(2), m.group(3), m.group(4))
      rewriteHop(m.group(1), lo, hi)
    })
    require("""[>)]\s*(\{\d|\+)""".r.findFirstIn(out).isEmpty,
      "quantified path patterns support only an anonymous single-hop " +
        "body — (()-[:T]->()){m,n} or -[:T]->{m,n} — got: " + pattern0)
    out
  }

  /** parsePatternChain plus the chain's extracted inline pattern
    * predicates (`(n WHERE …)` texts) for the caller to AND into its
    * clause predicate. */
  private def parsePatternChainW(pattern0: String,
                                 anon: () => String): ((Seq[NodePat], Seq[EdgePat]), Seq[String]) = {
    // strip inline predicates FIRST: a `)+` / `){2` inside a stripped
    // WHERE expression (e.g. `size(x)+1`) must never trip the QPP
    // guard, and the remaining text is then pure chain syntax
    val (stripped, inlinePreds) = stripInlineWheres(pattern0)
    val pattern = desugarQpp(stripped)
    val nodes = NodeRe.findAllMatchIn(pattern).map { m =>
      val v = Option(m.group(1)).getOrElse(anon())
      NodePat(v, Option(m.group(2)),
        Option(m.group(3)).map(parsePropsMap).getOrElse(Nil))
    }.toSeq
    // hops in textual order: scan the pattern for edge tokens
    // (quote-aware: a ']' inside a property-map string must not close
    // the bracket)
    val hops = (("""-\[(?:[^\]']|'[^']*')*\]->|<-\[(?:[^\]']|'[^']*')*\]-""").r)
      .findAllIn(pattern).map {
        case FwdRe(ev, t, star, lo, hi, pm) =>
          EdgePat(Option(t),
            if (star == null) 1 else Option(lo).map(_.toInt).getOrElse(1),
            if (star == null) 1 else Option(hi).map(_.toInt).getOrElse(10),
            reverse = false, Option(ev),
            Option(pm).map(parsePropsMap).getOrElse(Nil))
        case RevRe(ev, t, star, lo, hi, pm) =>
          EdgePat(Option(t),
            if (star == null) 1 else Option(lo).map(_.toInt).getOrElse(1),
            if (star == null) 1 else Option(hi).map(_.toInt).getOrElse(10),
            reverse = true, Option(ev),
            Option(pm).map(parsePropsMap).getOrElse(Nil))
        case other => throw new IllegalArgumentException(s"bad edge pattern: $other")
      }.toSeq
    require(nodes.nonEmpty && nodes.size == hops.size + 1,
      s"pattern must be a linear node chain: ${nodes.size} nodes, ${hops.size} hops")
    ((nodes, hops), inlinePreds)
  }

  private def parseMatchStage(patternPart0: String, whereOrNull: String,
                              outerVars: Set[String],
                              anon: () => String): MatchStage = {
    // clause regexes split `MATCH <pat> WHERE <pred>` at the FIRST
    // ` WHERE ` — wrong when an INLINE pattern predicate `(n WHERE …)`
    // fired first. Rejoin and re-split at the first TOP-LEVEL WHERE.
    val (patternPart, whereOpt) =
      if (whereOrNull == null) (patternPart0, None)
      else splitTopWhere(patternPart0 + " WHERE " + whereOrNull)
    val inlineTexts = scala.collection.mutable.Buffer.empty[String]
    def parsePattern(pattern: String): (Seq[NodePat], Seq[EdgePat]) = {
      val (c, ps) = parsePatternChainW(pattern, anon)
      inlineTexts ++= ps
      c
    }
    val segs = patternPart.split("(?i)\\s+OPTIONAL MATCH\\s+")
    // generic path variables: `p = <chain>` on a main chain binds p as
    // a path; every hop gets an edge variable (fresh for unnamed hops)
    // so the walk carries what nodes()/relationships()/length() need.
    // (`p = shortestPath(...)` never reaches here — the whole-statement
    // shortestPath route intercepts it first.)
    val PathEq = """(?s)^(\w+)\s*=\s*(.+)$""".r
    val paths = scala.collection.mutable.Buffer.empty[(String, Int)]
    val patterns = splitTopLevel(segs.head).zipWithIndex.map {
      case (PathEq(pv, chainText), i) =>
        require(!chainText.trim.toLowerCase.startsWith("shortestpath") &&
            !chainText.trim.toLowerCase.startsWith("allshortestpaths"),
          "shortestPath path bindings are only supported as the whole " +
            "statement (MATCH p = shortestPath(…) … RETURN …)")
        val (np, hp0) = parsePattern(chainText)
        val hp = hp0.map(h => if (h.v.isDefined) h else h.copy(v = Some(anon())))
        paths += ((pv, i))
        (np, hp)
      case (c, _) => parsePattern(c)
    }
    // connectivity: each chain must share a variable with the ones
    // before it (or an outer-bound one), or the product is a cartesian
    // blowup — reject
    patterns.tail.foldLeft(patterns.head._1.map(_.v).toSet ++ outerVars) { (seen, p) =>
      val vs = p._1.map(_.v).toSet
      require(vs.intersect(seen).nonEmpty,
        s"disconnected pattern (would be a cartesian product): ${p._1.map(_.v).mkString("-")}")
      seen ++ vs
    }
    val optChains = segs.tail.toSeq.map(s => parsePattern(s.trim))
    var boundVars = patterns.flatMap(_._1.map(_.v)).toSet ++ outerVars
    optChains.foreach { case (on, _) =>
      require(boundVars.contains(on.head.v),
        s"OPTIONAL MATCH must start at a bound variable, got '${on.head.v}'")
      boundVars ++= on.map(_.v).toSet
    }
    paths.foreach { case (pv, _) =>
      require(!boundVars.contains(pv),
        s"path variable '$pv' collides with a pattern variable")
    }
    MatchStage(patterns, optChains,
      andAll(whereOpt.toSeq.map(parseWhere(_, anon)) ++
        inlineTexts.map(parseWhere(_, anon))),
      paths.toSeq)
  }

  /** Collapse whitespace runs to single spaces OUTSIDE single-quoted
    * literals (a blanket replaceAll would rewrite `'Big  Label'` to
    * `'Big Label'` before any quote-aware parser runs — the literal's
    * own spacing must survive normalization). */
  private[graph] def normalizeWs(s0: String): String = {
    val s = s0.trim
    val sb = new java.lang.StringBuilder(s.length)
    var inStr = false
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        inStr = !inStr
        sb.append(ch)
      } else if (!inStr && ch.isWhitespace) pendingSpace = true
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** ORDER BY items → sort Columns (one definition for every site). */
  private def sortCols(ob: Seq[(String, Boolean)]): Seq[Column] =
    ob.map { case (cn, desc) => if (desc) col(cn).desc else col(cn).asc }

  def parse(q: String): Query = {
    val text0 = normalizeWs(q)
    // mid-query CALL { … } subqueries: MASK each brace body (quote-
    // aware, brace-balanced) behind a ` CALLSEG <i> ` marker BEFORE any
    // clause regex runs — the final-RETURN match and the WITH/UNWIND
    // pipeline split must not fire on clauses INSIDE the braces
    val callInner = scala.collection.mutable.Buffer.empty[String]
    val text = {
      val up = text0.toUpperCase
      val sb = new StringBuilder
      var i = 0; var inQ = false
      while (i < text0.length) {
        val ch = text0.charAt(i)
        lazy val braceAt = {
          var j = i + 4
          while (j < text0.length && text0.charAt(j).isWhitespace) j += 1
          if (j < text0.length && text0.charAt(j) == '{') j else -1
        }
        // a CALL token inside a pattern position is a label/variable,
        // not a subquery: `(c:Call {…})`, `-[:Call {…}]->`, `(call
        // {…})` — the previous non-space char discriminates (a clause
        // keyword can't follow ':', '(', ',', '[' or '|')
        lazy val prevNonSpace = {
          var j = i - 1
          while (j >= 0 && text0.charAt(j) == ' ') j -= 1
          if (j >= 0) text0.charAt(j) else ' '
        }
        if (ch == '\'') { inQ = !inQ; sb += ch; i += 1 }
        else if (!inQ && up.regionMatches(i, "CALL", 0, 4) &&
            (i == 0 || (!up.charAt(i - 1).isLetterOrDigit && up.charAt(i - 1) != '_')) &&
            !Set(':', '(', ',', '[', '|').contains(prevNonSpace) &&
            braceAt > 0) {
          var depth = 0; var q2 = false; var close = -1; var k = braceAt
          while (k < text0.length && close < 0) {
            val c2 = text0.charAt(k)
            if (c2 == '\'') q2 = !q2
            else if (!q2 && c2 == '{') depth += 1
            else if (!q2 && c2 == '}') { depth -= 1; if (depth == 0) close = k }
            k += 1
          }
          require(close > 0, s"unbalanced braces in CALL subquery: $text0")
          callInner += text0.substring(braceAt + 1, close).trim
          sb.append(" CALLSEG ").append(callInner.length - 1).append(" ")
          i = close + 1
        } else { sb += ch; i += 1 }
      }
      // COLLECT { … } bodies carry MATCH/RETURN keywords that would
      // mis-split the clause regexes below (the WITH-position case) —
      // mask them as identifier tokens; atomT() resolves them back
      maskCollect(normalizeWs(sb.toString).trim)
    }
    var anonId = 0
    val anon = () => { anonId += 1; s"_anon$anonId" }
    val mShortest = """(?i)MATCH (\w+) = (shortestPath|allShortestPaths)\((.+?)\)(?: WHERE (.+?))? RETURN (DISTINCT )?(.+?)(?: ORDER BY (.+?))?(?: SKIP (\d+))?(?: LIMIT (\d+))?\s*$""".r
    val mTail = """(?i)^(.+?) RETURN (DISTINCT )?(.+?)(?: ORDER BY (.+?))?(?: SKIP (\d+))?(?: LIMIT (\d+))?\s*$""".r
    val mStage1 = """(?i)^MATCH (.+?)(?: WHERE (.+))?$""".r
    val mWithSeg = """(?i)^(.+?)(?: WHERE (.+?))?(?: ORDER BY (.+?))?(?: SKIP (\d+))?(?: LIMIT (\d+))?(?: WHERE (.+?))?(?: MATCH (.+?)(?: WHERE (.+))?)?$""".r
    text match {
      case mShortest(pathVar, fn, pattern, whereOrNull, distinctOrNull, retPart, orderOrNull, skipOrNull, limitOrNull) =>
        val st = parseMatchStage(pattern, whereOrNull, Set.empty, anon)
        require(st.patterns.size == 1 && st.patterns.head._1.size == 2 &&
          st.optChains.isEmpty,
          "shortestPath needs a single (a)-[…]->(b) hop")
        val (nodes, hops) = st.patterns.head
        Query(MatchStage(Seq.empty, Seq.empty, st.where),
          ret = splitTopLevel(retPart).map(parseRetItem),
          distinct = distinctOrNull != null,
          orderBy = parseOrder(orderOrNull),
          skip = Option(skipOrNull).map(_.toInt),
          limit = Option(limitOrNull).map(_.toInt),
          sp = Some(ShortestPat(pathVar, nodes.head, hops.head, nodes(1),
            all = fn.equalsIgnoreCase("allShortestPaths"))))
      case mTail(head, distinctOrNull, retPart, orderOrNull, skipOrNull, limitOrNull) =>
        // pipeline separators: WITH, UNWIND, and masked CALL subquery
        // stages (CALLSEG markers — bodies were extracted to
        // `callInner` before any clause regex ran), in textual order.
        // The lookbehinds keep the separator from matching the
        // " WITH " inside STARTS WITH / ENDS WITH predicates
        val segRe = """(?i)(?<!STARTS)(?<!ENDS)\s+(WITH|UNWIND|CALLSEG)\s+""".r
        val ms = segRe.findAllMatchIn(head).toSeq
        val segTexts: Seq[(String, String)] =
          ("HEAD", if (ms.isEmpty) head else head.substring(0, ms.head.start)) +:
            ms.zipWithIndex.map { case (m, i) =>
              val end = if (i + 1 < ms.size) ms(i + 1).start else head.length
              (m.group(1).toUpperCase, head.substring(m.end, end))
            }
        val stage1 = segTexts.head._2 match {
          case mStage1(pat, whereOrNull) =>
            parseMatchStage(pat, whereOrNull, Set.empty, anon)
          case other => throw new IllegalArgumentException(s"unsupported query head: $other")
        }
        // names visible after each stage: a WITH REPLACES the scope with
        // its items; an UNWIND ADDS its alias (Cypher keeps the rest)
        var carried: Set[String] = stage1.patterns.flatMap(_._1.map(_.v)).toSet ++
          stage1.optChains.flatMap(_._1.map(_.v))
        def addNext(next: Option[MatchStage]): Unit =
          next.foreach(st => carried ++=
            st.patterns.flatMap(_._1.map(_.v)) ++ st.optChains.flatMap(_._1.map(_.v)))
        val mUnwind = """(?i)^(.+?)\s+AS\s+(\w+)(?:\s+MATCH\s+(.+?)(?:\s+WHERE\s+(.+))?)?$""".r
        val withStages: Seq[PipeStage] = segTexts.tail.map {
          case ("WITH", seg) => seg match {
            case mWithSeg(itemsPart0, havingOrNull, orderOrNull, skipOrNull,
                limitOrNull, postHavingOrNull, patOrNull, whereOrNull) =>
              // both WHERE groups matched with NO modifier between them
              // ⇒ the regex split ONE predicate at a nested WHERE (a
              // quantifier/comprehension body) — rejoin it. With a
              // modifier between, it's genuinely two WHERE clauses.
              val noMods = orderOrNull == null && skipOrNull == null && limitOrNull == null
              val (preHaving, postHaving) =
                if (havingOrNull != null && postHavingOrNull != null && noMods)
                  (s"$havingOrNull WHERE $postHavingOrNull", null)
                else (havingOrNull, postHavingOrNull)
              require(preHaving == null || postHaving == null,
                s"WITH stage has two WHERE clauses: $seg")
              val wdist = itemsPart0.trim.toUpperCase.startsWith("DISTINCT ")
              val itemsPart = if (wdist) itemsPart0.trim.substring(9) else itemsPart0
              val items = splitTopLevel(itemsPart).map(parseRetItem)
              carried = items.map(_.outName).toSet
              val next = Option(patOrNull).map(p =>
                parseMatchStage(p, whereOrNull, carried, anon))
              addNext(next)
              val having = Option(preHaving).orElse(Option(postHaving))
              WithStage(items, having.map(parseWhere(_, anon)), next,
                distinct = wdist,
                orderBy = parseOrder(orderOrNull),
                skip = Option(skipOrNull).map(_.toInt),
                limit = Option(limitOrNull).map(_.toInt),
                havingAfterLimit = postHaving != null)
            case other => throw new IllegalArgumentException(s"bad WITH stage: $other")
          }
          case ("CALLSEG", seg) =>
            val mCallSeg = """(?s)^(\d+)(?:\s+MATCH\s+(.+?)(?:\s+WHERE\s+(.+))?)?$""".r
            seg.trim match {
              case mCallSeg(idxStr, patOrNull, whereOrNull) =>
                val body = callInner(idxStr.toInt)
                // importing WITH: a bare comma-separated variable list
                // (Neo4j's rule — expressions need an outer WITH first)
                val mImp = """(?is)^WITH\s+(\w+(?:\s*,\s*\w+)*)\s+(.*)$""".r
                val (imports, innerText) = body match {
                  case mImp(vars, rest) =>
                    (vars.split(",").map(_.trim).toSeq, rest)
                  case _ => (Seq.empty[String], body)
                }
                imports.foreach(v => require(carried.contains(v),
                  s"CALL subquery imports unbound variable '$v'"))
                // UNION between full inner queries: each part compiles
                // independently (per-part guards below); Cypher's rule —
                // parts return the same columns
                val (partTexts0, isAll) = splitUnion(normalizeWs(innerText))
                // Neo4j's spelling repeats the importing WITH in every
                // union part — accept it as an alias when the variable
                // list matches the first part's
                val partTexts = partTexts0.head +: partTexts0.tail.map { pt =>
                  pt.trim match {
                    case mImp(vars, rest) =>
                      require(vars.split(",").map(_.trim).toSeq == imports,
                        "each UNION part's importing WITH must list the same " +
                          s"variables (${imports.mkString(", ")})")
                      rest
                    case other => other
                  }
                }
                def stageVars(st: MatchStage): Set[String] =
                  st.patterns.flatMap(_._1.map(_.v)).toSet ++
                    st.optChains.flatMap(_._1.map(_.v))
                // every MATCH-stage variable anywhere in a query,
                // recursing into nested CALL subquery parts — a
                // doubly-nested CALL's own leak check carries its OWN
                // outer set, which lacks the outermost vars, so the
                // outermost guard must see through the nesting
                def queryVars(q: Query): Set[String] =
                  stageVars(q.stage) ++ q.withStages.flatMap {
                    case ws: WithStage => ws.next.toSeq.flatMap(stageVars)
                    case u: UnwindStage => u.next.toSeq.flatMap(stageVars)
                    case c2: CallStage =>
                      c2.next.toSeq.flatMap(stageVars) ++
                        c2.inners.flatMap(queryVars)
                  }
                val inners = partTexts.map { pt =>
                  require(!pt.trim.toUpperCase.startsWith("CALL"),
                    "a CALL as the first clause inside a mid-query CALL subquery " +
                      "is not supported — compose procedures at the top level")
                  val inner = parse(pt)
                  require(inner.sp.isEmpty,
                    "shortestPath inside a CALL subquery is not supported")
                  // an outer variable used in ANY inner MATCH stage
                  // without being imported would silently rebind as a
                  // fresh full-scan variable — reject (stricter than
                  // Neo4j, which permits the same-name fresh binding;
                  // the silent full scan is the bug class this prevents)
                  val innerVars: Set[String] = queryVars(inner)
                  val leaked = innerVars.intersect(carried -- imports.toSet)
                  require(leaked.isEmpty,
                    s"CALL subquery references outer variable(s) " +
                      s"${leaked.toSeq.sorted.mkString(", ")} without importing them — " +
                      s"start the braces with WITH ${leaked.toSeq.sorted.mkString(", ")}")
                  if (imports.nonEmpty) {
                    if (inner.skip.isDefined || inner.limit.isDefined)
                      require(inner.orderBy.nonEmpty,
                        "SKIP/LIMIT inside a correlated CALL subquery needs an " +
                          "ORDER BY (the per-combo top-k must be deterministic)")
                    // mid-pipeline modifiers would apply GLOBALLY across
                    // combos under set-based execution — reject rather
                    // than silently drop other combos' rows
                    inner.withStages.foreach {
                      case ws: WithStage =>
                        require(ws.orderBy.isEmpty && ws.skip.isEmpty && ws.limit.isEmpty,
                          "ORDER BY/SKIP/LIMIT in a mid-pipeline WITH inside a " +
                            "correlated CALL subquery would apply globally, not per " +
                            "imported row — move the top-k to the subquery's final RETURN")
                        // the bare identity item (`WITH q, count(…)`) is
                        // the natural Cypher spelling and is fine; only
                        // ALIASING something else to an import name is
                        // rejected (it would corrupt the correlation key)
                        ws.items.foreach(it => require(
                          !imports.contains(it.outName) ||
                            (it.agg.isEmpty && it.prop.isEmpty && it.term.isEmpty &&
                              it.v == it.outName),
                          s"CALL subquery WITH re-declares imported variable '${it.outName}'"))
                      // unwind() materializes via withColumn(alias, …),
                      // which silently REPLACES an existing column — an
                      // UNWIND aliased to an import name would overwrite
                      // the correlation key and the join-back would
                      // return wrong rows; reject like the WITH case
                      case u: UnwindStage => require(!imports.contains(u.alias),
                        s"CALL subquery UNWIND re-declares imported variable '${u.alias}'")
                      case _ => ()
                    }
                  }
                  inner
                }
                val outs = inners.head.ret.map(_.outName)
                inners.tail.foreach { p =>
                  require(p.ret.map(_.outName).sorted == outs.sorted,
                    s"CALL subquery UNION parts must return the same columns: " +
                      s"${outs.mkString(", ")} vs ${p.ret.map(_.outName).mkString(", ")}")
                }
                if (imports.nonEmpty && inners.size > 1) {
                  inners.foreach(p => require(
                    p.orderBy.isEmpty && p.skip.isEmpty && p.limit.isEmpty,
                    "ORDER BY/SKIP/LIMIT on a UNION part inside a correlated " +
                      "CALL subquery is not supported"))
                  require(!inners.exists(p =>
                      p.ret.nonEmpty && p.ret.forall(_.agg.isDefined)),
                    "an all-aggregate UNION part inside a correlated CALL " +
                      "subquery is not supported (the per-combo empty-input " +
                      "fill is ambiguous across parts) — restructure")
                }
                // uncorrelated multi-part: only the TRAILING part's
                // ORDER BY/SKIP/LIMIT applies (Cypher's trailing rule);
                // Neo4j REJECTS modifiers on non-final parts, so a
                // silent drop here would diverge — reject loudly too
                if (imports.isEmpty && inners.size > 1)
                  inners.init.foreach(p => require(
                    p.orderBy.isEmpty && p.skip.isEmpty && p.limit.isEmpty,
                    "ORDER BY/SKIP/LIMIT on a non-final UNION part inside a " +
                      "CALL subquery is not supported (only the trailing part's " +
                      "modifiers apply, to the whole union)"))
                outs.foreach(o => require(!carried.contains(o),
                  s"CALL subquery returns '$o', already declared in the outer scope"))
                carried ++= outs
                val next = Option(patOrNull).map(p =>
                  parseMatchStage(p, whereOrNull, carried, anon))
                addNext(next)
                CallStage(imports, inners, isAll, next)
              case other => throw new IllegalArgumentException(
                s"bad CALL subquery continuation: $other " +
                  "(expected [MATCH …] then WITH/UNWIND/RETURN)")
            }
          case ("UNWIND", seg) => seg match {
            case mUnwind(srcPart, aliasName, patOrNull, whereOrNull) =>
              val src = srcPart.trim
              val (srcVar, lits, litNum, srcTerm) =
                if (src.startsWith("[")) {
                  require(src.endsWith("]"), s"bad UNWIND list: $src")
                  val parts = src.substring(1, src.length - 1).split(",")
                    .toSeq.map(_.trim).filter(_.nonEmpty)
                  val vals = parts.map(p =>
                    if (p.startsWith("'") && p.endsWith("'") && p.length >= 2)
                      p.substring(1, p.length - 1)
                    else p)
                  (None, vals, parts.forall(_.matches("-?\\d+")), None)
                } else if (src.matches("\\w+")) {
                  require(carried.contains(src), s"unbound UNWIND source '$src'")
                  (Some(src), Seq.empty[String], false, None)
                } else {
                  // any list-valued term: range(1, 5), a CASE over
                  // carried lists, … — the general UNWIND source
                  (None, Seq.empty[String], false,
                    Some(new PredParser(src).parseTerm()))
                }
              carried = carried + aliasName
              val next = Option(patOrNull).map(p =>
                parseMatchStage(p, whereOrNull, carried, anon))
              addNext(next)
              UnwindStage(srcVar, lits, litNum, aliasName, next, srcTerm)
            case other => throw new IllegalArgumentException(s"bad UNWIND stage: $other")
          }
          case (kw, seg) => throw new IllegalArgumentException(s"bad $kw stage: $seg")
        }
        Query(stage1, withStages = withStages,
          ret = splitTopLevel(retPart).map(parseRetItem),
          distinct = distinctOrNull != null,
          orderBy = parseOrder(orderOrNull),
          skip = Option(skipOrNull).map(_.toInt),
          limit = Option(limitOrNull).map(_.toInt))
      case _ => throw new IllegalArgumentException(s"unsupported query: $q")
    }
  }

  // ------------------------------------------------------------- compiling

  /** Split a query text at top-level `UNION [ALL]` separators —
    * outside string literals and `{ }` subquery braces. Returns the
    * part texts and the ALL flag; Cypher (and this subset) rejects
    * mixing bare UNION with UNION ALL in one query. */
  private def splitUnion(text: String): (Seq[String], Boolean) = {
    val up = text.toUpperCase
    val cuts = scala.collection.mutable.Buffer.empty[(Int, Int, Boolean)]
    var depth = 0
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '\'' =>
          val e = text.indexOf('\'', i + 1)
          require(e > 0, s"unterminated string literal in: $text")
          i = e
        case '{' => depth += 1
        case '}' => depth -= 1
        case _ =>
          if (depth == 0 && up.regionMatches(i, " UNION ALL ", 0, 11)) {
            cuts += ((i, i + 11, true)); i += 10
          } else if (depth == 0 && up.regionMatches(i, " UNION ", 0, 7)) {
            cuts += ((i, i + 7, false)); i += 6
          }
      }
      i += 1
    }
    if (cuts.isEmpty) (Seq(text), false)
    else {
      require(cuts.map(_._3).distinct.size == 1,
        "mixing UNION and UNION ALL in one query is not allowed")
      val starts = 0 +: cuts.map(_._2).toSeq
      val ends = cuts.map(_._1).toSeq :+ text.length
      (starts.zip(ends).map { case (s, e) => text.substring(s, e).trim },
        cuts.head._3)
    }
  }

  /** Compile + run a query against (nodes, edges) frames from
    * [[SysmonGraph.build]]. Returned columns are the RETURN items'
    * [[RetItem.outName]]s: bare vars yield the node id, `v.prop`
    * yields `v_prop`, aggregates yield `count`/`sum_v_prop`/… or the
    * `AS` alias.
    *
    * `UNION` / `UNION ALL` between full queries: each part compiles
    * independently; parts must return the SAME column names (Cypher's
    * rule); bare UNION deduplicates the combined rows, UNION ALL keeps
    * them — `unionByName` + `distinct`, the C10 composition shape. A
    * trailing ORDER BY / SKIP / LIMIT on the LAST part orders the
    * WHOLE union (Neo4j semantics — it's the query's final modifier,
    * not the subquery's). */
  /** Parameterized read: `$name` tokens substitute as literals before
    * parsing — numbers inline bare (they compare numerically), strings
    * quote (they compare as strings), matching the reference's typed
    * `session.run(cypher, **params)` behavior. The literal grammar has
    * no escape sequences, so a string value containing a single quote
    * is rejected rather than silently mis-parsed. Longer names
    * substitute first so `$key` never clobbers `$key2`'s prefix. */
  def run(nodes: DataFrame, edges: DataFrame, cypher: String,
          params: Map[String, Any]): DataFrame = {
    val substituted = params.toSeq.sortBy(-_._1.length)
      .foldLeft(cypher) { case (q, (k, v)) =>
        // Floating values render via BigDecimal.toPlainString: the
        // literal grammar (-?\d+(\.\d+)?) rejects scientific notation,
        // so 1e7.toString ("1.0E7") would fail to parse. Types with no
        // literal form (Boolean, dates, …) reject loudly rather than
        // silently quoting into a string comparison.
        val rendered = v match {
          case null => throw new IllegalArgumentException(
            s"null parameter $$${k}: read-surface params must be bound " +
              "(use IS NULL predicates for null semantics)")
          case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
          case d: Double =>
            require(!d.isNaN && !d.isInfinite,
              s"parameter $$${k}: NaN/Infinity have no Cypher literal form")
            BigDecimal(d).bigDecimal.toPlainString
          case f: Float =>
            require(!f.isNaN && !f.isInfinite,
              s"parameter $$${k}: NaN/Infinity have no Cypher literal form")
            BigDecimal(f.toDouble).bigDecimal.toPlainString
          case bd: scala.math.BigDecimal => bd.bigDecimal.toPlainString
          case bd: java.math.BigDecimal => bd.toPlainString
          case bi: scala.math.BigInt => bi.toString
          case s: String =>
            require(!s.contains("'"),
              s"parameter $$${k} contains a single quote — the Cypher literal " +
                "grammar has no escapes; filter via a DataFrame predicate instead")
            "'" + s + "'"
          case other => throw new IllegalArgumentException(
            s"parameter $$${k}: unsupported type " +
              s"${other.getClass.getSimpleName} — pass a number or a string")
        }
        q.replaceAll("\\$" + java.util.regex.Pattern.quote(k) + "\\b",
          java.util.regex.Matcher.quoteReplacement(rendered))
      }
    val leftover = """\$\w+""".r.findFirstIn(substituted)
    require(leftover.isEmpty, s"unbound parameter ${leftover.get} in: $cypher")
    run(nodes, edges, substituted)
  }

  def run(nodes: DataFrame, edges: DataFrame, cypher: String): DataFrame = {
    // COLLECT-mask hygiene: tokens created during this compile (incl.
    // nested runs for CALL subqueries, which truncate to their own
    // entry mark) are released when it finishes — resolution happens
    // at parse time, so the returned frame never reads the buffer
    val cb = collectBodies.get(); val mark = cb.size
    try runImpl(nodes, edges, cypher)
    finally if (cb.size > mark) cb.remove(mark, cb.size - mark)
  }

  private def runImpl(nodes: DataFrame, edges: DataFrame, cypher: String): DataFrame = {
    // Cypher-5 CALL SUBQUERY: `CALL { <full query> } <continuation>` —
    // the inner text runs through this same entry (so UNION, WITH
    // pipelines, nested CALLs, procedures all work inside the braces)
    // and the continuation composes over the inner result frame via
    // the shared CALL-tail machinery (WHERE / MATCH / aggregate
    // RETURN / ORDER BY — the post-UNION-aggregation idiom).
    // Importing-WITH (correlated) subqueries are a loud error.
    val t0 = normalizeWs(cypher).trim
    if (t0.toUpperCase.matches("""(?s)CALL\s*\{.*""")) {
      val open = t0.indexOf('{')
      var depth = 0; var i = open; var inQ = false; var close = -1
      while (i < t0.length && close < 0) {
        val ch = t0.charAt(i)
        if (ch == '\'') inQ = !inQ
        else if (!inQ && ch == '{') depth += 1
        else if (!inQ && ch == '}') { depth -= 1; if (depth == 0) close = i }
        i += 1
      }
      require(close > 0, s"unbalanced braces in CALL subquery: $cypher")
      val inner = t0.substring(open + 1, close).trim
      require(inner.nonEmpty, "empty CALL { } subquery")
      require(!inner.toUpperCase.startsWith("WITH "),
        "importing-WITH (correlated) CALL subqueries are not supported — " +
          "run the outer part first or restructure as a WITH pipeline")
      val frame = run(nodes, edges, inner)
      val tail = t0.substring(close + 1).trim
      // a top-level UNION in the continuation would be silently
      // swallowed into the tail projection — reject loudly (the UNION
      // belongs INSIDE the braces; unioning a subquery result with a
      // second full query is not supported)
      locally {
        var d = 0; var q = false; var j = 0
        val up = tail.toUpperCase
        while (j < tail.length) {
          val ch = tail.charAt(j)
          if (ch == '\'') q = !q
          else if (!q && (ch == '{' || ch == '(')) d += 1
          else if (!q && (ch == '}' || ch == ')')) d -= 1
          else if (!q && d == 0 && up.regionMatches(j, "UNION", 0, 5) &&
              (j == 0 || !up.charAt(j - 1).isLetterOrDigit) &&
              (j + 5 >= up.length || !up.charAt(j + 5).isLetterOrDigit))
            throw new IllegalArgumentException(
              "UNION after a CALL { } subquery is not supported — put the " +
                "UNION inside the braces")
          j += 1
        }
      }
      return if (tail.isEmpty) frame
             else CypherCall.compileTail(nodes, edges, frame, tail)
    }
    // GDS-style procedure statements route to the CALL surface (J7);
    // parameter substitution has already happened (textual), so
    // $params work identically in CALL config maps and tails
    if (CypherCall.isCall(cypher)) return CypherCall.run(nodes, edges, cypher)
    val (parts, isAll) = splitUnion(normalizeWs(cypher))
    if (parts.size > 1) {
      val qLast = parse(parts.last)
      val frames = parts.init.map(p => runParsed(nodes, edges, parse(p))) :+
        runParsed(nodes, edges,
          qLast.copy(orderBy = Seq.empty, skip = None, limit = None))
      val names = frames.head.columns.toSeq
      frames.tail.foreach { f =>
        require(f.columns.toSeq.sorted == names.sorted,
          s"UNION parts must return the same columns: " +
            s"${names.mkString(", ")} vs ${f.columns.mkString(", ")}")
      }
      var combined = frames.reduce(_.unionByName(_))
      if (!isAll) combined = combined.distinct()
      if (qLast.orderBy.nonEmpty)
        combined = combined.orderBy(sortCols(qLast.orderBy): _*)
      qLast.skip.foreach(n => combined = combined.offset(n))
      qLast.limit.foreach(n => combined = combined.limit(n))
      return combined
    }
    runParsed(nodes, edges, parse(cypher))
  }

  /** `start`: an already-bound frame the first MATCH stage joins
    * against on shared variable names (the WithStage.next mechanism) —
    * the CALL surface passes its yielded frame here so `CALL … YIELD
    * id MATCH (id)-[:T]->(x) …` composes. */
  private[graph] def runParsed(nodes: DataFrame, edges: DataFrame, q: Query,
                               start: Option[DataFrame] = None): DataFrame = {
    val c = new Compiler(nodes, edges)
    q.sp.foreach { sp =>
      require(start.isEmpty, "shortestPath cannot follow a CALL YIELD")
      return c.runShortestPath(q, sp)
    }
    val bound = c.pipelineStages(start, q)
    // `RETURN p ORDER BY p.image` — ordering by a PROPERTY of a
    // returned variable that isn't itself projected is Neo4j-legal:
    // project the sort keys as hidden items, sort, drop. Only for
    // non-aggregate non-DISTINCT projections (with implicit grouping
    // or DISTINCT the sort keys must be projected items — Cypher's own
    // rule, and the loud unresolved-column error stands in for it).
    val outNames = q.ret.map(_.outName)
    val hidden: Seq[RetItem] =
      if (q.distinct || q.ret.exists(_.agg.isDefined)) Nil
      else q.orderBy.map(_._1).filterNot(outNames.contains).distinct.flatMap { name =>
        val bareVars = q.ret
          .filter(it => it.agg.isEmpty && it.prop.isEmpty && it.term.isEmpty)
          .map(_.v).toSet
        // an EXISTING pre-projection column wins (a carried `WITH …
        // AS p_src` alias must not be reinterpreted as property 'src'
        // of variable 'p'); otherwise the "v_prop" name splits at the
        // LONGEST prefix matching a returned bare variable (so
        // `ORDER BY a_b.c` resolves against variable a_b, not a.b_c)
        if (bound.columns.contains(name)) Some(RetItem(None, name, None))
        else name.zipWithIndex.collect { case ('_', i) => i }
          .sortBy(-_).collectFirst {
            case i if bareVars.contains(name.substring(0, i)) && i + 1 < name.length =>
              RetItem(None, name.substring(0, i), Some(name.substring(i + 1)))
          }
      }
    var out = c.project(bound, q.ret ++ hidden, q.distinct)
    if (q.orderBy.nonEmpty)
      out = out.orderBy(sortCols(q.orderBy): _*)
    if (hidden.nonEmpty) out = out.drop(hidden.map(_.outName): _*)
    q.skip.foreach(n => out = out.offset(n))
    q.limit.foreach(n => out = out.limit(n))
    out
  }

  /** The stage compiler: carries the graph frames and turns MATCH
    * stages / predicates / projections into DataFrame operations. */
  private[graph] final class Compiler(nodes: DataFrame, edges: DataFrame) {

    /** Compile the first MATCH stage plus every WITH/UNWIND/CALL
      * pipeline stage of a query — everything up to (not including)
      * the final projection. Shared by [[runParsed]] and the
      * CALL-subquery compiler. */
    private[graph] def pipelineStages(start: Option[DataFrame], q: Query): DataFrame =
      pipelineTail(compileStage(start, q.stage), q)

    /** The WITH/UNWIND/CALL stage loop over an already-compiled first
      * stage. */
    private def pipelineTail(bound0: DataFrame, q: Query): DataFrame = {
      var bound = bound0
      q.withStages.foreach {
        case ws: WithStage =>
          bound = project(bound, ws.items, distinct = ws.distinct)
          if (!ws.havingAfterLimit)
            ws.having.foreach { p => bound = applyPred(bound, p) }
          // mid-pipeline ORDER BY matters only as a SKIP/LIMIT modifier
          // (Cypher semantics — row order doesn't survive the next join
          // in either engine); together they are the top-k-then-continue
          // idiom (`WITH p, count(*) AS n ORDER BY n DESC LIMIT 10 MATCH …`)
          if (ws.orderBy.nonEmpty)
            bound = bound.orderBy(sortCols(ws.orderBy): _*)
          ws.skip.foreach(n => bound = bound.offset(n))
          ws.limit.foreach(n => bound = bound.limit(n))
          // Cypher-5 clause order (WITH … ORDER BY … LIMIT … WHERE …):
          // the WHERE filters AFTER the top-k is taken
          if (ws.havingAfterLimit)
            ws.having.foreach { p => bound = applyPred(bound, p) }
          ws.next.foreach { st => bound = compileStage(Some(bound), st) }
        case u: UnwindStage =>
          bound = unwind(bound, u)
          u.next.foreach { st => bound = compileStage(Some(bound), st) }
        case cs: CallStage =>
          bound = compileCall(bound, cs)
          cs.next.foreach { st => bound = compileStage(Some(bound), st) }
      }
      bound
    }

    /** Mid-query CALL subquery (see [[CallStage]]): run the inner
      * pipeline from the DISTINCT imported-variable combinations, with
      * the imports INJECTED into the inner projection (so an inner
      * aggregate groups per combo — Cypher's per-row semantics,
      * set-based), then join the declared outputs back onto the outer
      * frame. */
    private def compileCall(outer: DataFrame, cs: CallStage): DataFrame = {
      val qHead = cs.inners.head
      cs.imports.foreach(v => require(outer.columns.contains(v),
        s"CALL subquery imports unbound variable '$v'"))
      qHead.ret.map(_.outName).foreach(o => require(!outer.columns.contains(o),
        s"CALL subquery returns '$o', which collides with an outer column"))
      val importItems = cs.imports.map(v => parseRetItem(v))
      val start =
        if (cs.imports.nonEmpty)
          Some(outer.select(cs.imports.map(col): _*).distinct())
        else None
      // one UNION part: thread the imports through every inner WITH
      // projection (a WITH replaces the scope, and without the import
      // columns a per-stage aggregation would group GLOBALLY instead
      // of per combo, and the join-back key would vanish —
      // re-declaration is rejected at parse time), then compile and
      // project with the imports injected
      def compilePart(q0: Query): DataFrame = {
        val q = if (cs.imports.isEmpty) q0 else q0.copy(withStages =
          q0.withStages.map {
            case ws: WithStage => ws.copy(items =
              importItems.filterNot(ii => ws.items.exists(_.outName == ii.outName))
                ++ ws.items)
            case other => other
          })
        val stage1Vars: Set[String] = q.stage.patterns.flatMap(_._1.map(_.v)).toSet ++
          q.stage.optChains.flatMap(_._1.map(_.v))
        val innerBound =
          if (cs.imports.nonEmpty && stage1Vars.intersect(cs.imports.toSet).isEmpty)
            // imports declared but not used by the first pattern (legal
            // Cypher — e.g. only the final RETURN groups per combo):
            // compile the head standalone and pair every combo with its
            // rows; later stages still see the import columns
            pipelineTail(compileStage(None, q.stage).crossJoin(start.get), q)
          else pipelineStages(start, q)
        project(innerBound, importItems ++ q.ret, q.distinct)
      }
      var inner = compilePart(qHead)
      if (cs.inners.size > 1) {
        inner = cs.inners.tail.map(compilePart).foldLeft(inner)(_ unionByName _)
        if (!cs.unionAll) inner = inner.distinct()
      }
      // modifiers: single-part semantics below use qHead's (multi-part
      // correlated modifiers are rejected at parse; multi-part
      // uncorrelated applies the LAST part's, Cypher's trailing rule)
      val q = if (cs.imports.isEmpty) cs.inners.last else qHead
      if (cs.imports.nonEmpty && cs.inners.size == 1 &&
          (q.skip.isDefined || q.limit.isDefined)) {
        // per-import-combo SKIP/LIMIT: a windowed rank over the combo
        // partition (the C7 top-k shape — keyed, never a global sort);
        // ORDER BY is enforced present at parse time
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(cs.imports.map(col): _*)
          .orderBy(sortCols(q.orderBy): _*)
        inner = inner.withColumn("__callrn", row_number().over(w))
        val lo = q.skip.getOrElse(0)
        q.limit.foreach(k => inner = inner.filter(col("__callrn") <= lo + k))
        if (lo > 0) inner = inner.filter(col("__callrn") > lo)
        inner = inner.drop("__callrn")
      }
      if (cs.imports.isEmpty) {
        // uncorrelated: every inner row pairs with every outer row
        // (Neo4j's cartesian rule); inner ORDER BY/SKIP/LIMIT are
        // global and fine here, applied before the pairing
        var in2 = inner
        if (q.orderBy.nonEmpty)
          in2 = in2.orderBy(sortCols(q.orderBy): _*)
        q.skip.foreach(n => in2 = in2.offset(n))
        q.limit.foreach(n => in2 = in2.limit(n))
        outer.crossJoin(in2)
      } else if (cs.inners.size == 1 && q.ret.nonEmpty &&
          q.ret.forall(_.agg.isDefined)) {
        // all-aggregate RETURN: one row per combo even with zero
        // matches — left join + Cypher's empty-input fills (single
        // part only; multi-part all-aggregate is rejected at parse)
        var j = outer.join(inner, cs.imports, "left")
        q.ret.foreach { it =>
          val n = it.outName
          it.agg.get match {
            case "count" => j = j.withColumn(n, coalesce(col(n), lit(0L)))
            case "sum"   => j = j.withColumn(n, coalesce(col(n), lit(0.0)))
            case "collect" =>
              val dt = inner.schema(n).dataType
              j = j.withColumn(n,
                when(col(n).isNull, array().cast(dt)).otherwise(col(n)))
            case _ => () // min/max/avg/stdev/percentile: null on empty, like Cypher
          }
        }
        j
      } else outer.join(inner, cs.imports, "inner")
    }

    /** One equality Column per property-map entry over a frame's
      * `props` map column (`id` reads the id column itself). Numeric
      * literals compare as double — same typing rule as WHERE. */
    private def propsCond(props: Seq[(String, String, Boolean)]): Option[Column] =
      props.map { case (k, v, numeric) =>
        val c = if (k == "id") col("id") else element_at(col("props"), k)
        if (numeric) c.cast("double") === v.toDouble else c === v
      }.reduceOption(_ && _)

    /** The node-id set a pattern node constrains to (label and/or
      * property map), as a 1-column `id` frame filtered at the node
      * scan; None when unconstrained. */
    private def nodeFilterIds(n: NodePat): Option[DataFrame] = {
      if (n.label.isEmpty && n.props.isEmpty) None
      else n.label match {
        case Some(le) if le.exists(c => c == '|' || c == '&' || c == '!') =>
          // Cypher-5 LABEL EXPRESSION — compiled at the ID-SET level
          // because this model stores one row per (label, id): a
          // conjunction can never hold on a single row, and a negation
          // must clear EVERY row of the id. Inline props (node-level in
          // Neo4j) gate on ANY row of the id; the single-positive-label
          // case below keeps the historical same-row semantics (and the
          // cheaper single-scan plan).
          var ids = labelExprIds(le)
          propsCond(n.props).foreach { c =>
            ids = ids.join(nodes.filter(c).select(col("id")).distinct(),
              Seq("id"), "left_semi")
          }
          Some(ids)
        case _ =>
          var nf = nodes
          n.label.foreach(l => nf = nf.filter(col("label") === l))
          propsCond(n.props).foreach(c => nf = nf.filter(c))
          Some(nf.select(col("id")))
      }
    }

    /** Distinct node-id frame satisfying a label expression. Precedence
      * ! > & > | on a flat string: split on `|`, each group on `&`,
      * atoms optionally `!`-negated. Positives compose by semi-join,
      * negatives by anti-join, groups union+distinct. */
    private def labelExprIds(le: String): DataFrame = {
      def labIds(l: String) = {
        require(l.matches("\\w+"), s"bad label expression ':$le'")
        nodes.filter(col("label") === l).select(col("id"))
      }
      val groups = le.split("\\|", -1).toSeq
      require(groups.forall(_.nonEmpty), s"bad label expression ':$le'")
      groups.map { grp =>
        val atoms = grp.split("&", -1).toSeq
        require(atoms.forall(_.nonEmpty), s"bad label expression ':$le'")
        val (neg, pos) = atoms.partition(_.startsWith("!"))
        var ids = pos match {
          case head +: rest =>
            rest.foldLeft(labIds(head))((acc, l) =>
              acc.join(labIds(l), Seq("id"), "left_semi"))
          case _ => nodes.select(col("id")).distinct()
        }
        neg.foreach(a => ids = ids.join(labIds(a.drop(1)), Seq("id"), "left_anti"))
        ids
      }.reduce(_ unionByName _).distinct()
    }

    /** Edge scan filtered to a hop's type spec — a single type or a
      * Cypher `:A|B` disjunction (compiles to isin, same pushed scan
      * filter shape). */
    private def edgesOfType(t: Option[String]): DataFrame = t match {
      case Some(tt) if tt.contains("|") =>
        val parts = tt.split("\\|", -1).toSeq
        require(parts.forall(_.matches("\\w+")), s"bad relationship type expression ':$tt'")
        edges.filter(col("etype").isin(parts: _*))
      case Some(tt) => edges.filter(col("etype") === tt)
      case None => edges
    }

    /** Semi-join a frame's `as` column down to the ids matching the
      * pattern node's label/props (no-op when unconstrained). */
    private def applyNodeFilter(df: DataFrame, n: NodePat, as: String): DataFrame =
      nodeFilterIds(n) match {
        case Some(ids) => df.join(ids.select(col("id").as(as)), Seq(as), "left_semi")
        case None => df
      }

    private def seedOf(n: NodePat): DataFrame = nodeFilterIds(n) match {
      case Some(ids) => ids.select(col("id").as(n.v))
      case None => nodes.select(col("id").as(n.v)).distinct()
    }

    /** Bounded (from, to) pair set for a hop; a named single hop also
      * carries the edge's property map and event_id for WHERE/RETURN. */
    private def hopPairs(h: EdgePat): DataFrame = {
      val e1 = edgesOfType(h.etype)
      // inline edge property map `-[:T {k: 'v'}]->` filters at the edge
      // scan; on a variable-length hop it constrains EVERY traversed
      // edge (Cypher semantics)
      val e0 = propsCond(h.props).map(e1.filter).getOrElse(e1)
      h.v match {
        case Some(ev) if h.min == 1 && h.max == 1 =>
          // merged edges are unique per (etype, src, dst) — no distinct;
          // the carried etype serves type(r) (constant when the hop is
          // typed, the real per-row type on an untyped -[r]-> hop)
          return if (h.reverse)
            e0.select(col("dst").as("_from"), col("src").as("_to"),
              col("props").as(s"${ev}__props"), col("event_id").as(s"${ev}__event_id"),
              col("etype").as(s"${ev}__etype"))
          else
            e0.select(col("src").as("_from"), col("dst").as("_to"),
              col("props").as(s"${ev}__props"), col("event_id").as(s"${ev}__event_id"),
              col("etype").as(s"${ev}__etype"))
        case Some(ev) =>
          // VAR-LENGTH named hop `-[r:T*1..3]->`: `r` binds as the LIST
          // of traversed relationships — one row per DISTINCT PATH
          // (Neo4j's multiplicity for named var-length matches; the
          // unnamed hop keeps this engine's documented pair-dedup), with
          // Neo4j's relationship-isomorphism enforced (an edge appears
          // at most once per path — the array_contains guard — which
          // also bounds enumeration on cyclic graphs). Elements render
          // as "src-[TYPE]->dst" in GRAPH direction and traversal
          // order — the same encoding relationships(p) yields on the
          // shortestPath surface, so the two list shapes compose.
          // Merged edges are unique per (etype, src, dst), so the
          // string IS the relationship identity.
          require(h.min >= 1 && h.max >= h.min && h.max <= 10,
            s"variable-length bounds out of range: *${h.min}..${h.max}")
          val estr = concat(col("src"), lit("-["), col("etype"), lit("]->"),
            col("dst"))
          val base = (if (h.reverse)
              e0.select(col("dst").as("_from"), col("src").as("_to"), estr.as("_e"))
            else
              e0.select(col("src").as("_from"), col("dst").as("_to"), estr.as("_e")))
            .distinct().persist()
          var cur = base.select(col("_from"), col("_to"), array(col("_e")).as(ev))
          var acc: DataFrame = if (h.min <= 1) cur else null
          for (k <- 2 to h.max) {
            cur = cur.join(
                base.select(col("_from").as("_mid"), col("_to").as("_nxt"), col("_e")),
                cur("_to") === col("_mid"))
              .filter(!array_contains(col(ev), col("_e")))
              .select(col("_from"), col("_nxt").as("_to"),
                concat(col(ev), array(col("_e"))).as(ev))
              .localCheckpoint()
            // no distinct: a path list is reconstructible from exactly
            // one (prefix, edge) decomposition, so rows stay unique
            if (k >= h.min) acc = if (acc == null) cur else acc.unionByName(cur)
          }
          base.unpersist()
          return acc
        case None => ()
      }
      val e = (if (h.reverse) e0.select(col("dst").as("_from"), col("src").as("_to"))
               else e0.select(col("src").as("_from"), col("dst").as("_to")))
        .distinct()
      if (h.min == 1 && h.max == 1) e
      else {
        require(h.min >= 1 && h.max >= h.min && h.max <= 10,
          s"variable-length bounds out of range: *${h.min}..${h.max}")
        val base = e.persist()
        var cur = base
        var acc: DataFrame = if (h.min <= 1) base else null
        for (k <- 2 to h.max) {
          cur = cur.join(base.select(col("_from").as("_mid"), col("_to").as("_nxt")),
              cur("_to") === col("_mid"))
            .select(col("_from"), col("_nxt").as("_to"))
            .distinct()
            .localCheckpoint()
          if (k >= h.min) acc = if (acc == null) cur else acc.unionByName(cur).distinct()
        }
        base.unpersist()
        acc
      }
    }

    /** Named edge variable → its (source, destination) NODE variables
      * in graph direction (reverse hops swap) — serves startNode()/
      * endNode(). */
    private val edgeEnds = scala.collection.mutable.Map.empty[String, (String, String)]

    /** Generic path variable → its bound chain ([[MatchStage.paths]])
      * — serves nodes()/relationships()/length() and bare-`p` RETURNs. */
    private val pathBinds =
      scala.collection.mutable.Map.empty[String, (Seq[NodePat], Seq[EdgePat])]

    /** Compile a path accessor over a path-bound chain: per-hop
      * relationship data comes from the walk's carried columns —
      * single hops render "src-[TYPE]->dst" from the endpoint vars +
      * the `__etype` column (graph direction; reverse hops swap ends),
      * var-length hops ARE a relationship list already. nodes(p)
      * splits traversal targets back out of the strings for
      * var-length hops (forward: after "]->", reverse: before "-["). */
    private def pathAccessor(pv: String, fn: String): Column = {
      val (np, hops) = pathBinds(pv)
      val relArrs: Seq[Column] = hops.map { h =>
        val ev = h.v.get
        if (h.min == 1 && h.max == 1) {
          val (s, d) = edgeEnds(ev)
          array(concat(col(s), lit("-["), col(s"${ev}__etype"), lit("]->"), col(d)))
        } else col(ev)
      }
      val rels =
        if (relArrs.isEmpty) expr("CAST(array() AS ARRAY<STRING>)")
        else if (relArrs.size == 1) relArrs.head
        else concat(relArrs: _*)
      fn match {
        case "relationships" => rels
        case "length" => size(rels).cast("long")
        case "nodes" =>
          val stepArrs = hops.zipWithIndex.map { case (h, i) =>
            if (h.min == 1 && h.max == 1) array(col(np(i + 1).v))
            else if (h.reverse)
              transform(col(h.v.get), x => regexp_extract(x, "^(.*?)-\\[", 1))
            else
              transform(col(h.v.get), x => regexp_extract(x, "\\]->(.*)$", 1))
          }
          concat(array(col(np.head.v)) +: stepArrs: _*)
        case other => throw new IllegalArgumentException(
          s"$other() is not a path accessor")
      }
    }

    /** Walk a chain: one join per hop, label semi-joins as we bind; a
      * hop into an ALREADY-bound variable becomes an equality join
      * (cycle/repeated-variable patterns). */
    private def walk(seed: DataFrame, pats: Seq[NodePat], hops: Seq[EdgePat]): DataFrame = {
      var b = seed
      hops.zipWithIndex.foreach { case (h, i) =>
        val from = pats(i).v
        val to = pats(i + 1).v
        // startNode()/endNode() need a SINGLE edge — a var-length
        // edge variable is a relationship list, so it never registers
        // here and those functions stay loud on it
        if (h.min == 1 && h.max == 1) h.v.foreach { ev =>
          edgeEnds(ev) = if (h.reverse) (to, from) else (from, to)
        }
        val pairs = hopPairs(h)
        if (b.columns.contains(to)) {
          b = b.join(pairs, b(from) === pairs("_from") && b(to) === pairs("_to"))
            .drop("_from", "_to")
        } else {
          b = b.join(pairs, b(from) === pairs("_from"))
            .drop("_from").withColumnRenamed("_to", to)
        }
        b = applyNodeFilter(b, pats(i + 1), to)
      }
      b
    }

    /** Compile one MATCH stage, optionally continuing from a frame of
      * already-bound variables (the WITH carry). */
    def compileStage(start: Option[DataFrame], st: MatchStage): DataFrame = {
      st.paths.foreach { case (pv, i) => pathBinds(pv) = st.patterns(i) }
      var bound = start.orNull
      st.patterns.foreach { case (np, hp) =>
        if (bound == null) bound = walk(seedOf(np.head), np, hp)
        else if (bound.columns.contains(np.head.v)) {
          bound = walk(applyNodeFilter(bound, np.head, np.head.v), np, hp)
        } else {
          val sub = walk(seedOf(np.head), np, hp)
          val shared = bound.columns.intersect(sub.columns).filterNot(_.contains("__")).toSeq
          require(shared.nonEmpty, s"pattern ${np.map(_.v).mkString("-")} shares no variable")
          bound = bound.join(sub, shared)
        }
      }
      // WHERE split for OPTIONAL MATCH (Cypher semantics): a top-level
      // conjunct whose variables are all from ONE optional chain filters
      // that chain BEFORE its left join; mixing optional and required
      // variables (or two optional chains) in one conjunct is rejected
      // (silently evaluating null→false would turn the left join inner)
      val optVarSets: Seq[Set[String]] =
        st.optChains.map { case (on, oh) =>
          (on.drop(1).map(_.v) ++ oh.flatMap(_.v)).toSet
        }
      val conjuncts: Seq[Pred] = st.where.toSeq.flatMap {
        case And(ps) => ps
        case p => Seq(p)
      }
      val chainConds = Array.fill(st.optChains.size)(
        scala.collection.mutable.Buffer.empty[Pred])
      val mainConds = scala.collection.mutable.Buffer.empty[Pred]
      conjuncts.foreach { p =>
        val hits = optVarSets.zipWithIndex.filter(_._1.intersect(p.vars).nonEmpty)
        if (hits.isEmpty) mainConds += p
        else {
          require(hits.size == 1 && p.vars.subsetOf(hits.head._1),
            s"WHERE conjunct mixes optional and required variables (${p.vars.mkString(", ")}); " +
              "split it into separate conjuncts")
          chainConds(hits.head._2) += p
        }
      }
      // OPTIONAL MATCH chains in order: walk each from its shared
      // variable's bound values, filter with that chain's conjuncts,
      // then left-join — non-matching rows keep nulls for the optional
      // variables (a later chain may hang off an earlier optional
      // variable; null seeds simply don't match)
      st.optChains.zipWithIndex.foreach { case ((on, oh), i) =>
        val shared = on.head.v
        val optSeed = applyNodeFilter(
          bound.select(col(shared)).distinct(), on.head, shared)
        var opt = walk(optSeed, on, oh)
        chainConds(i).foreach { p => opt = applyPred(opt, p) }
        bound = bound.join(opt, Seq(shared), "left")
      }
      mainConds.foreach { p => bound = applyPred(bound, p) }
      bound
    }

    /** `UNWIND xs AS x` — one row per element of the list column (or a
      * literal list); the source column stays in scope. A pure
      * narrow-map operation: no shuffle, rows fan out in place. */
    def unwind(df0: DataFrame, u: UnwindStage): DataFrame = {
      var df = df0
      val src: Column = u.srcTerm match {
        case Some(t) =>
          val (d2, c) = compileTerm(df, t, numeric = false)
          df = d2
          c
        case None => u.srcVar match {
          case Some(v) =>
            require(df.columns.contains(v), s"unbound UNWIND source '$v'")
            col(v)
          case None =>
            if (u.literalsNumeric) array(u.literals.map(s => lit(s.toLong)): _*)
            else array(u.literals.map(lit): _*)
        }
      }
      df.withColumn(u.alias, explode(src))
    }

    /** Property access — edge vars read the carried props map, node
      * vars join the nodes frame; returns (frame, actual column name). */
    private def bindProp(df: DataFrame, v: String, prop: String): (DataFrame, String) = {
      val cn = s"${v}_$prop"
      if (df.columns.contains(cn)) (df, cn)
      else if (df.columns.contains(s"${v}__props")) {
        val c = if (prop == "event_id") col(s"${v}__event_id").cast("string")
                else element_at(col(s"${v}__props"), prop)
        (df.withColumn(cn, c), cn)
      } else if (prop == "id") (df, v)
      else {
        require(df.columns.contains(v), s"unbound variable '$v'")
        // a var-length edge variable is a relationship LIST — property
        // access on it has no single referent; refuse loudly instead
        // of silently joining an array against the nodes frame
        require(!df.schema(v).dataType
            .isInstanceOf[org.apache.spark.sql.types.ArrayType],
          s"'$v.$prop': '$v' is a list (var-length edge variable?) — " +
            "property access needs a single node/edge; use UNWIND or a " +
            "list comprehension")
        val pn = nodes.select(col("id").as(v), element_at(col("props"), prop).as(cn))
        (df.join(pn, Seq(v), "left"), cn)
      }
    }

    /** Parse a duration() literal argument to (years, months, days,
      * millis) — java.time.Period for the calendar designators (weeks
      * fold into days), java.time.Duration for the time part. */
    private def parseIsoDuration(t: Term): (Long, Long, Long, Long) = {
      val iso = t match {
        case StrT(s0) => s0
        case _ => throw new IllegalArgumentException(
          "duration() takes an ISO-8601 'string' literal like 'PT5M', 'P2D', 'P1M', " +
            "or a {years:, months:, weeks:, days:, hours:, minutes:, seconds:} map")
      }
      val tIdx = iso.indexOf('T')
      val datePart = if (tIdx < 0) iso else iso.substring(0, tIdx)
      val timePart = if (tIdx < 0) "" else iso.substring(tIdx)
      val p = if (datePart.length > 1) java.time.Period.parse(datePart)
              else java.time.Period.ZERO
      val d = if (timePart.nonEmpty) java.time.Duration.parse("P" + timePart)
              else java.time.Duration.ZERO
      (p.getYears.toLong, p.getMonths.toLong, p.getDays.toLong, d.toMillis)
    }

    private def isNumericTerm(t: Term): Boolean = t match {
      case _: NumT | _: CastT | _: ArithT => true
      case FuncT("size", _) => true
      case FuncT("length", _) => true // path length
      // epoch millis / duration millis — numeric; date()/datetime()
      // stay non-numeric (they compare as DATE/TIMESTAMP, and a double
      // cast would null them)
      case FuncT("timestamp" | "duration", _) => true
      case FuncT("abs" | "round" | "floor" | "ceil" | "sqrt" | "sign", _) => true
      case FuncN("round", _) => true
      case _: SizePat => true
      case CaseT(bs, e) => bs.exists(b => isNumericTerm(b._2)) || e.exists(isNumericTerm)
      case CoalesceT(ts) => ts.exists(isNumericTerm)
      case ReduceT(_, init, _, _, expr) => isNumericTerm(init) || isNumericTerm(expr)
      case _ => false
    }

    /** Element type of a list-valued column against a frame (schema
      * analysis only — no job). None when the column isn't list-typed
      * or doesn't analyze standalone. */
    private def dfElemType(d: DataFrame, c: Column)
        : Option[org.apache.spark.sql.types.DataType] =
      scala.util.Try(d.select(c).schema.head.dataType).toOption.collect {
        case org.apache.spark.sql.types.ArrayType(et, _) => et }

    /** Element type of a lambda source term, where statically known:
      * a bound lambda variable's recorded type, or a nested filter-only
      * comprehension over one (element type unchanged). Drives the
      * size()-over-lambda-variable dispatch below. */
    private def lamElemType(t: Term,
                            btypes: Map[String, org.apache.spark.sql.types.DataType])
        : Option[org.apache.spark.sql.types.DataType] = t match {
      case PropT(w, None) => btypes.get(w).collect {
        case org.apache.spark.sql.types.ArrayType(et, _) => et }
      case CompT(_, src, _, None) => lamElemType(src, btypes)
      // builtins with fixed element types — keeps size() dispatch
      // decidable for the common nested sources
      case FuncN("split", _) => Some(org.apache.spark.sql.types.StringType)
      case _: RangeT => Some(org.apache.spark.sql.types.LongType)
      case ListT(ts) if ts.nonEmpty && ts.forall(_.isInstanceOf[StrT]) =>
        Some(org.apache.spark.sql.types.StringType)
      case ListT(ts) if ts.nonEmpty && ts.forall(_.isInstanceOf[NumT]) =>
        Some(org.apache.spark.sql.types.DoubleType)
      case _ => None
    }

    /** Compile a term inside a HOF lambda: names in `binds` (the
      * comprehension/quantifier/reduce variables) resolve to their
      * lambda-argument Columns; any subterm mentioning NONE of them
      * compiles through `outer` (the enclosing compiler — so literals
      * and captured row columns work). `btypes` carries each lambda
      * variable's Spark type where known (bound at the HOF call sites
      * from the SOURCE list's element type) — size() over a lambda
      * variable dispatches on it (element count for list-typed
      * variables, string length otherwise; a blanket length() would
      * mis-compute over list-of-list sources). */
    /** Clamped Cypher list slice (shared by the term compiler and the
      * lambda path): both bounds normalize negatives from the end and
      * CLAMP into [0, size] — Cypher's out-of-range rule; Spark's raw
      * slice() would reinterpret an underflowing negative start as
      * from-the-end or throw at start 0. */
    private def sliceCol(c0: Column, fOpt: Option[Int], tOpt: Option[Int]): Column = {
      def norm(i: Int): Column = if (i >= 0) lit(i) else size(c0) + lit(i)
      val from0 = greatest(lit(0), fOpt.map(norm).getOrElse(lit(0)))
      val to0 = least(size(c0), tOpt.map(norm).getOrElse(size(c0)))
      slice(c0, from0 + lit(1), greatest(lit(0), to0 - from0))
    }

    private def lambdaTerm(t: Term, binds: Map[String, Column], num: Boolean,
                           outer: (Term, Boolean) => Column,
                           btypes: Map[String, org.apache.spark.sql.types.DataType] = Map.empty): Column = t match {
      case PropT(w, None) if binds.contains(w) =>
        if (num) binds(w).cast("double") else binds(w)
      case PropT(w, Some(p)) if binds.contains(w) => throw new IllegalArgumentException(
        s"'$w.$p': a comprehension variable is a scalar, not a node (no properties)")
      case t0 if t0.vars.intersect(binds.keySet).isEmpty => outer(t0, num)
      case CastT("toboolean", t0) =>
        lambdaTerm(t0, binds, num = false, outer, btypes).try_cast("boolean")
      case CastT(fn, t0) =>
        val raw = lambdaTerm(t0, binds, num = true, outer, btypes)
        if (fn == "tointeger") raw.cast("long") else raw.cast("double")
      case ArithT(o, a, b) =>
        val l = lambdaTerm(a, binds, num, outer, btypes)
        val r = lambdaTerm(b, binds, num, outer, btypes)
        o match {
          case "+" => l + r
          case "-" => l - r
          case "*" => l * r
          case "/" => l / r
          case "%" => l % r
        }
      case CompT(cv, src, wh, proj) =>
        // nested comprehension: its variable shadows within the lambda
        val srcC = lambdaTerm(src, binds, num = false, outer, btypes)
        val bt2 = lamElemType(src, btypes) match {
          case Some(et) => btypes + (cv -> et)
          case None => btypes - cv
        }
        val filtered = wh.map(w =>
          filter(srcC, xx => lambdaPred(w, binds + (cv -> xx), outer, bt2))).getOrElse(srcC)
        proj.map(e =>
          transform(filtered, xx =>
            lambdaTerm(e, binds + (cv -> xx), isNumericTerm(e), outer, bt2)))
          .getOrElse(filtered)
      case ReduceT(accN, init, vN, src, expr) =>
        val srcC = lambdaTerm(src, binds, num = false, outer, btypes)
        val initC = lambdaTerm(init, binds, isNumericTerm(init), outer, btypes)
        val bt2 = (lamElemType(src, btypes) match {
          case Some(et) => btypes + (vN -> et)
          case None => btypes - vN
        }) - accN
        aggregate(srcC, initC, (acc, xx) =>
          lambdaTerm(expr, binds + (accN -> acc) + (vN -> xx), isNumericTerm(expr), outer, bt2))
      case FuncT(fn, t0) =>
        lazy val raw = lambdaTerm(t0, binds, num = false, outer, btypes)
        lazy val rawN = lambdaTerm(t0, binds, num = true, outer, btypes)
        fn match {
          case "tolower" => lower(raw)
          case "toupper" => upper(raw)
          case "trim" => trim(raw)
          case "ltrim" => ltrim(raw)
          case "rtrim" => rtrim(raw)
          case "tostring" => raw.cast("string")
          case "size" => t0 match {
            case _: ListT | _: RangeT | _: CompT | _: PatCompT | _: SliceT | FuncN("split", _) | FuncT("nodes" | "relationships", _) => size(raw)
            case PropT(w, None) if binds.contains(w) =>
              // dispatch on the recorded element type: a list-typed
              // variable counts elements, a known scalar is Cypher's
              // size(string) = length; an UNKNOWN type is a hard error —
              // silently guessing length() would mis-compute when the
              // source is list-of-lists
              btypes.get(w) match {
                case Some(_: org.apache.spark.sql.types.ArrayType) => size(raw)
                case Some(_) => length(raw)
                case None => throw new IllegalArgumentException(
                  s"size($w): '$w' has no statically-known type here (the lambda source's " +
                    "element type is opaque, e.g. a projecting comprehension); apply size() " +
                    "to the source list directly or toString() the element for string length")
              }
            case _ => length(raw)
          }
          case "head" => element_at(raw, 1)
          case "last" => element_at(raw, -1)
          case "abs" => abs(rawN)
          case "round" => round(rawN, 0)
          case "floor" => floor(rawN)
          case "ceil" => ceil(rawN)
          case "sqrt" => sqrt(rawN)
          case "sign" => signum(rawN)
          case "date" => to_date(raw)
          case "datetime" => to_timestamp(raw)
          case "timestamp" => unix_millis(to_timestamp(raw))
          case other => throw new IllegalArgumentException(
            s"$other() not supported over a comprehension variable")
        }
      case CoalesceT(ts) => coalesce(ts.map(lambdaTerm(_, binds, num, outer, btypes)): _*)
      case ListT(ts) => array(ts.map(lambdaTerm(_, binds, num, outer, btypes)): _*)
      case FuncN("split", Seq(s0, StrT(d))) =>
        split(lambdaTerm(s0, binds, num = false, outer, btypes), java.util.regex.Pattern.quote(d))
      case FuncN("replace", Seq(s0, StrT(f), StrT(r))) =>
        regexp_replace(lambdaTerm(s0, binds, num = false, outer, btypes),
          java.util.regex.Pattern.quote(f), java.util.regex.Matcher.quoteReplacement(r))
      case FuncN("substring", ts) if ts.size == 2 || ts.size == 3 =>
        val s0 = lambdaTerm(ts.head, binds, num = false, outer, btypes)
        val start = lambdaTerm(ts(1), binds, num = true, outer, btypes).cast("int") + lit(1)
        val len = if (ts.size == 3) lambdaTerm(ts(2), binds, num = true, outer, btypes).cast("int")
                  else length(s0)
        s0.substr(start, len)
      case FuncN("round", Seq(x, NumT(p))) =>
        round(lambdaTerm(x, binds, num = true, outer, btypes), p.toInt)
      case IndexT(s0, i) =>
        try_element_at(lambdaTerm(s0, binds, num = false, outer, btypes),
          lit(if (i >= 0) i + 1 else i))
      case SliceT(s0, fOpt, tOpt) =>
        sliceCol(lambdaTerm(s0, binds, num = false, outer, btypes), fOpt, tOpt)
      case other => throw new IllegalArgumentException(
        s"unsupported term over a comprehension variable: $other")
    }

    /** Compile a predicate inside a HOF lambda (the WHERE of a list
      * comprehension or any/all/none/single quantifier). exists()
      * pattern predicates and CASE need row context — rejected. */
    private def lambdaPred(p: Pred, binds: Map[String, Column],
                           outer: (Term, Boolean) => Column,
                           btypes: Map[String, org.apache.spark.sql.types.DataType] = Map.empty): Column = p match {
      // the ref-vs-literal fast-path Leaf is semantically a CmpLeaf
      case Leaf(c) => lambdaPred(CmpLeaf(PropT(c.v, c.prop), c.op,
        if (c.numeric) NumT(c.value.toDouble) else StrT(c.value)), binds, outer, btypes)
      case CmpLeaf(l, "=~", r) =>
        val pat = r match {
          case StrT(p0) => p0
          case _ => throw new IllegalArgumentException("=~ needs a 'string' literal pattern")
        }
        lambdaTerm(l, binds, num = false, outer, btypes).rlike(s"^(?:$pat)$$")
      case CmpLeaf(l, op, r) =>
        val numeric = isNumericTerm(l) || isNumericTerm(r)
        val lc = lambdaTerm(l, binds, numeric, outer, btypes)
        val rc = lambdaTerm(r, binds, numeric, outer, btypes)
        op match {
          case "=" => lc === rc
          case "<>" => lc =!= rc
          case ">" => lc > rc
          case ">=" => lc >= rc
          case "<" => lc < rc
          case "<=" => lc <= rc
          case "CONTAINS" => lc.contains(rc)
          case "STARTS WITH" => lc.startsWith(rc)
          case "ENDS WITH" => lc.endsWith(rc)
        }
      case NullLeaf(t, isNull) =>
        val c = lambdaTerm(t, binds, num = false, outer, btypes)
        if (isNull) c.isNull else c.isNotNull
      case InPred(l, ListT(ts)) =>
        val vals: Seq[Any] = ts.map {
          case NumT(n) => n
          case StrT(s0) => s0
          case other => throw new IllegalArgumentException(
            s"IN list elements must be literals, got $other")
        }
        val numeric = ts.nonEmpty && ts.forall(_.isInstanceOf[NumT])
        val lc = lambdaTerm(l, binds, numeric, outer, btypes)
        if (vals.isEmpty) lit(false) else lc.isin(vals: _*)
      case InPred(l, r) =>
        array_contains(lambdaTerm(r, binds, num = false, outer, btypes),
          lambdaTerm(l, binds, num = false, outer, btypes))
      case QuantPred(q, qv, src, w) =>
        // nested quantifier: its variable shadows within the lambda
        val srcC = lambdaTerm(src, binds, num = false, outer, btypes)
        val bt2 = lamElemType(src, btypes) match {
          case Some(et) => btypes + (qv -> et)
          case None => btypes - qv
        }
        val lam = (xx: Column) => lambdaPred(w, binds + (qv -> xx), outer, bt2)
        q match {
          case "any" => exists(srcC, lam)
          case "all" => forall(srcC, lam)
          case "none" => !exists(srcC, lam)
          case "single" => size(filter(srcC, lam)) === 1
        }
      case Not(p0) => !lambdaPred(p0, binds, outer, btypes)
      case And(ps) => ps.map(lambdaPred(_, binds, outer, btypes)).reduce(_ && _)
      case Or(ps) => ps.map(lambdaPred(_, binds, outer, btypes)).reduce(_ || _)
      case other => throw new IllegalArgumentException(
        s"unsupported predicate inside a list lambda: $other")
    }

    /** Compile a scalar term over a frame, binding prop columns as
      * needed; `numeric` forces refs to double (the comparison/
      * arithmetic context). toInteger truncates (cast via long). */
    private def compileTerm(df0: DataFrame, t: Term, numeric: Boolean): (DataFrame, Column) = {
      var df = df0
      def go(t: Term, num: Boolean): Column = t match {
        case PropT(v, Some(pr)) =>
          val (df2, n) = bindProp(df, v, pr)
          df = df2
          if (num) col(n).cast("double") else col(n)
        case PropT(v, None) =>
          require(df.columns.contains(v), s"unbound identifier '$v'")
          if (num) col(v).cast("double") else col(v)
        case NumT(x) => lit(x)
        case StrT(s0) => lit(s0)
        case CastT("toboolean", t0) =>
          // Cypher toBoolean: 'true'/'false' (case-insensitive) →
          // boolean, anything else → null — try_cast, because the ANSI
          // cast RAISES on malformed input where Cypher nulls
          go(t0, num = false).try_cast("boolean")
        case CastT(fn, t0) =>
          // inner evaluates numerically so toInteger TRUNCATES ("3.7" →
          // 3.7 → 3) instead of null-ing on a non-integral string cast
          val raw = go(t0, num = true)
          if (fn == "tointeger") raw.cast("long") else raw.cast("double")
        case FuncT(fn @ ("length" | "nodes" | "relationships"), t0) =>
          // path accessors as TERMS (r10): usable anywhere the term
          // grammar reaches — WHERE length(p) > 2, size(nodes(p)), …
          // — on a GENERIC path binding (shortestPath's own RETURN
          // route keeps its dist-backed handling)
          val v = t0 match {
            case PropT(vv, None) => vv
            case _ => throw new IllegalArgumentException(
              s"$fn() takes a bare path variable")
          }
          require(pathBinds.contains(v),
            s"$fn() needs a path variable (a `MATCH $v = <chain>` binding), got '$v'")
          pathAccessor(v, fn)
        case FuncT(fn @ ("labels" | "keys" | "properties"), t0) =>
          // node/edge accessors: the argument must be a bare variable;
          // node metadata binds lazily via ONE left join per variable
          val v = t0 match {
            case PropT(vv, None) => vv
            case _ => throw new IllegalArgumentException(s"$fn() takes a bare node/edge variable")
          }
          if (df.columns.contains(s"${v}__props")) {
            // edge variable: the walk carried its props map on the row
            fn match {
              case "keys" => array_sort(map_keys(col(s"${v}__props")))
              case "properties" => col(s"${v}__props")
              case _ => throw new IllegalArgumentException("labels() needs a node variable")
            }
          } else {
            require(df.columns.contains(v), s"unbound variable '$v'")
            val meta = s"__meta_$v"
            if (!df.columns.contains(s"${meta}_label")) {
              val pn = nodes.select(col("id").as(v),
                col("label").as(s"${meta}_label"), col("props").as(s"${meta}_props"))
              df = df.join(pn, Seq(v), "left")
            }
            fn match {
              case "labels" => array(col(s"${meta}_label")) // one label per node in this model
              case "keys" => array_sort(map_keys(col(s"${meta}_props")))
              case "properties" => col(s"${meta}_props")
            }
          }
        case FuncT("size", t0) =>
          // size() counts LIST elements when the argument is a list
          // column (the collect→size idiom) or a literal list;
          // otherwise string length
          val raw = go(t0, num = false)
          t0 match {
            case _: ListT | _: RangeT | _: CompT | _: PatCompT | _: SliceT | FuncN("split", _) | FuncT("nodes" | "relationships", _) => size(raw)
            case PropT(v, None) if df.columns.contains(v) &&
                df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
              size(raw)
            case _ => length(raw)
          }
        case FuncT(fn @ ("head" | "last"), t0) =>
          // first/last element of a list (null on empty — Cypher
          // semantics; element_at is 1-based, -1 = last)
          val raw = go(t0, num = false)
          if (fn == "head") element_at(raw, 1) else element_at(raw, -1)
        case FuncT("type", t0) =>
          // relationship type — needs a named single-hop edge variable
          // (the walk carried its etype onto the row)
          val v = t0 match {
            case PropT(vv, None) => vv
            case _ => throw new IllegalArgumentException("type() takes a bare edge variable")
          }
          require(df.columns.contains(s"${v}__etype"),
            s"type() needs a named single-hop edge variable, got '$v'")
          col(s"${v}__etype")
        case FuncT(fn @ ("startnode" | "endnode"), t0) =>
          // source/destination node id of a named edge, in GRAPH
          // direction (a reverse hop's startNode is still the edge's
          // source) — resolved to the pattern's node variable column
          val ev = t0 match {
            case PropT(vv, None) => vv
            case _ => throw new IllegalArgumentException(s"$fn() takes a bare edge variable")
          }
          val (sv, dv) = edgeEnds.getOrElse(ev, throw new IllegalArgumentException(
            s"$fn() needs a named single-hop edge variable, got '$ev'"))
          val nodeVar = if (fn == "startnode") sv else dv
          require(df.columns.contains(nodeVar),
            s"$fn($ev): node variable '$nodeVar' is not in scope")
          col(nodeVar)
        case FuncT("id", t0) =>
          // node/element id — this model's node KEY (a string; Neo4j's
          // internal numeric ids have no analogue here)
          val v = t0 match {
            case PropT(vv, None) => vv
            case _ => throw new IllegalArgumentException("id() takes a bare variable")
          }
          require(df.columns.contains(v), s"unbound variable '$v'")
          if (num) col(v).cast("double") else col(v)
        case FuncT(fn @ ("date" | "datetime" | "timestamp"), t0) =>
          // temporal constructors over stored string props (Spark's
          // string→date/timestamp cast accepts 'yyyy-MM-dd[ HH:mm:ss…]');
          // timestamp() yields epoch MILLIS (numeric — Neo4j's
          // datetime().epochMillis idiom), so durations are plain
          // arithmetic: timestamp(b) - timestamp(a) < duration('PT5M')
          val raw = go(t0, num = false)
          fn match {
            case "date" => to_date(raw)
            case "datetime" => to_timestamp(raw)
            case "timestamp" => unix_millis(to_timestamp(raw))
          }
        case FuncT("duration", t0) =>
          // ISO-8601 duration LITERAL → millis (a compile-time
          // constant; day/hour/minute/second designators). A CALENDAR
          // duration (years/months — no fixed millis value) only makes
          // sense anchored to a date, i.e. in the `datetime ± duration`
          // additive position, which the ArithT case below intercepts.
          val (y, mo, d, ms) = parseIsoDuration(t0)
          require(y == 0 && mo == 0,
            "calendar duration (years/months) needs a date anchor - " +
              "write it as datetime(x) + duration('P1M') / date(x) - duration({months: 1})")
          lit(d * 86400000L + ms)
        case ArithT(op @ ("+" | "-"), a, FuncT("duration", dt))
            if { val (y, mo, _, _) = parseIsoDuration(dt); y != 0 || mo != 0 } =>
          // datetime/date ± calendar duration → timestamp arithmetic
          // with a year-month interval (add_months semantics — Spark's
          // make_interval; a millis constant cannot represent 'one
          // month')
          val (y, mo, d, ms) = parseIsoDuration(dt)
          val sign = if (op == "-") -1L else 1L
          val ts = go(a, num = false)
          ts + make_interval(lit(y * sign), lit(mo * sign), lit(0L), lit(d * sign),
            lit(0L), lit(0L), lit(BigDecimal(ms * sign) / 1000))
        case FuncT(fn @ ("abs" | "round" | "floor" | "ceil" | "sqrt" | "sign"), t0) =>
          // numeric functions evaluate their argument numerically;
          // round() is round-half-up on positives (Spark HALF_UP vs
          // Neo4j half-away-from-zero — identical for non-negative
          // inputs, the stored-telemetry case)
          val raw = go(t0, num = true)
          fn match {
            case "abs" => abs(raw)
            case "round" => round(raw, 0)
            case "floor" => floor(raw)
            case "ceil" => ceil(raw)
            case "sqrt" => sqrt(raw)
            case "sign" => signum(raw)
          }
        case FuncN("split", ts) =>
          // Cypher split is a LITERAL delimiter (Spark's is a regex —
          // quote it); returns a list
          require(ts.size == 2, "split(s, delim) takes two arguments")
          val delim = ts(1) match {
            case StrT(d) => d
            case _ => throw new IllegalArgumentException("split() delimiter must be a 'string' literal")
          }
          split(go(ts.head, num = false), java.util.regex.Pattern.quote(delim))
        case FuncN("replace", ts) =>
          // literal search/replace (regex metachars quoted both sides)
          require(ts.size == 3, "replace(s, find, repl) takes three arguments")
          (ts(1), ts(2)) match {
            case (StrT(f), StrT(r)) =>
              regexp_replace(go(ts.head, num = false),
                java.util.regex.Pattern.quote(f),
                java.util.regex.Matcher.quoteReplacement(r))
            case _ => throw new IllegalArgumentException(
              "replace() find/repl must be 'string' literals")
          }
        case FuncN("substring", ts) =>
          // Cypher substring(s, start[, length]) is 0-INDEXED; Spark's
          // substr is 1-indexed — shift by one
          require(ts.size == 2 || ts.size == 3, "substring(s, start[, len])")
          val s0 = go(ts.head, num = false)
          val start = go(ts(1), num = true).cast("int") + lit(1)
          val len = if (ts.size == 3) go(ts(2), num = true).cast("int") else length(s0)
          s0.substr(start, len)
        case FuncN(lr @ ("left" | "right"), ts) =>
          // Cypher left(s, n) / right(s, n) — prefix/suffix of length n
          require(ts.size == 2, s"$lr(s, n) takes two arguments")
          val s0 = go(ts.head, num = false)
          val n0 = go(ts(1), num = true).cast("int")
          if (lr == "left") s0.substr(lit(1), n0)
          else s0.substr(greatest(length(s0) - n0 + 1, lit(1)), n0)
        case FuncN("round", Seq(x, p)) =>
          // round(value, precision): Spark's round takes a LITERAL scale
          val scale = p match {
            case NumT(s0) => s0.toInt
            case other => throw new IllegalArgumentException(
              s"round(x, precision) needs a literal integer precision, got $other")
          }
          round(go(x, num = true), scale)
        case FuncN(fn, _) => throw new IllegalArgumentException(s"unsupported function: $fn")
        case FuncT(fn, t0) =>
          // string functions take the RAW string regardless of the
          // comparison context (num applies to the function's result)
          val raw = go(t0, num = false)
          fn match {
            case "tolower" => lower(raw)
            case "toupper" => upper(raw)
            case "trim" => trim(raw)
            case "ltrim" => ltrim(raw)
            case "rtrim" => rtrim(raw)
            case "tostring" => raw.cast("string")
          }
        case CoalesceT(ts) =>
          // first non-null; members evaluate in the enclosing
          // comparison's typing context so branches stay type-consistent
          coalesce(ts.map(go(_, num)): _*)
        case ListT(ts) => array(ts.map(go(_, num)): _*)
        case RangeT(a, b) =>
          sequence(go(a, num = true).cast("long"), go(b, num = true).cast("long"))
        case CompT(cv, src, wh, proj) =>
          // [x IN xs WHERE p | e] → filter()/transform() HOFs; outer
          // refs compile through go (binding row columns as needed);
          // the source's element type rides along so size(x) dispatches
          val srcC = go(src, num = false)
          val bt = dfElemType(df, srcC).map(et => Map(cv -> et)).getOrElse(Map.empty)
          val filtered = wh.map(w =>
            filter(srcC, xx => lambdaPred(w, Map(cv -> xx), (t2, n2) => go(t2, n2), bt))).getOrElse(srcC)
          proj.map(e =>
            transform(filtered, xx =>
              lambdaTerm(e, Map(cv -> xx), isNumericTerm(e), (t2, n2) => go(t2, n2), bt)))
            .getOrElse(filtered)
        case ReduceT(accN, init, vN, src, expr) =>
          // reduce(acc = init, x IN xs | expr) → aggregate() HOF
          val srcC = go(src, num = false)
          val initC = go(init, isNumericTerm(init))
          val bt = dfElemType(df, srcC).map(et => Map(vN -> et)).getOrElse(Map.empty)
          aggregate(srcC, initC, (acc, xx) =>
            lambdaTerm(expr, Map(accN -> acc, vN -> xx), isNumericTerm(expr),
              (t2, n2) => go(t2, n2), bt))
        case SizePat(chain @ (np, hops), innerWhere) =>
          // pattern count per anchor value: walk the chain from the
          // DISTINCT anchor values, filter with the inner WHERE (over
          // pattern variables), count matches, left-join back
          // (0 when nothing matches) — the aggregated-semi-join shape
          // Catalyst broadcasts like exists()
          val anchor = np.head.v
          require(df.columns.contains(anchor),
            s"size() pattern must start at a bound variable, got '$anchor'")
          sizeSeq += 1
          val cn = s"__psize$sizeSeq"
          var matches = walk(
            applyNodeFilter(df.select(col(anchor)).distinct(), np.head, anchor),
            np, hops)
          innerWhere.foreach { p => matches = applyPred(matches, p) }
          val cnt = matches.groupBy(col(anchor)).agg(count(lit(1)).as(cn))
          df = df.join(cnt, Seq(anchor), "left")
          coalesce(col(cn), lit(0L))
        case PatCompT(chain @ (np, hops), innerWhere, proj, pcDistinct) =>
          // pattern comprehension: the SizePat aggregated-semi-join
          // shape returning sort_array(collect_list(expr)) instead of
          // a count; anchors with no match fill [] (Cypher). The
          // projection compiles against the MATCHES frame, so it sees
          // the pattern's variables (props bind there, not on the
          // outer row).
          val anchor = np.head.v
          require(df.columns.contains(anchor),
            s"pattern comprehension must start at a bound variable, got '$anchor'")
          sizeSeq += 1
          val cn = s"__pcomp$sizeSeq"
          var matches = walk(
            applyNodeFilter(df.select(col(anchor)).distinct(), np.head, anchor),
            np, hops)
          innerWhere.foreach { p => matches = applyPred(matches, p) }
          val (m2, pc) = compileTerm(matches, proj, isNumericTerm(proj))
          // struct-wrap before collect_list: Cypher KEEPS null
          // projections in the list (a match with a missing property
          // still contributes an element) while collect_list silently
          // drops bare nulls; the struct is non-null per match, sorts
          // deterministically (nulls-first within the field), and
          // unwraps after the aggregation
          val collected = collect_list(struct(pc.as("v")))
          val lst = m2.groupBy(col(anchor))
            .agg(sort_array(
              if (pcDistinct) array_distinct(collected) else collected).as(cn))
          val dt = lst.schema(cn).dataType
          df = df.join(lst, Seq(anchor), "left")
          transform(
            when(col(cn).isNull, array().cast(dt)).otherwise(col(cn)),
            x => x.getField("v"))
        case IndexT(s0, i) =>
          // Cypher 0-indexed; element_at is 1-based with negatives
          // already counting from the end; null past either bound
          try_element_at(go(s0, num = false), lit(if (i >= 0) i + 1 else i))
        case SliceT(s0, fOpt, tOpt) =>
          sliceCol(go(s0, num = false), fOpt, tOpt)
        case MapProjT(v, props, star) =>
          // the variable's full props map: edge vars carry it on the
          // row, node vars join it once (the labels()/properties()
          // metadata binding, shared guard column)
          val pm: Column =
            if (df.columns.contains(s"${v}__props")) col(s"${v}__props")
            else {
              require(df.columns.contains(v), s"unbound variable '$v'")
              val meta = s"__meta_$v"
              if (!df.columns.contains(s"${meta}_label")) {
                val pn = nodes.select(col("id").as(v),
                  col("label").as(s"${meta}_label"), col("props").as(s"${meta}_props"))
                df = df.join(pn, Seq(v), "left")
              }
              col(s"${meta}_props")
            }
          if (star) pm
          else map(props.flatMap(p => Seq(lit(p), element_at(pm, p))): _*)
        case CaseT(bs, e) =>
          // searched CASE: branch predicates compile through the full
          // predicate grammar (prop binds / exists joins update `df`),
          // branch values in the enclosing typing context
          val compiled = bs.map { case (p, t0) =>
            val (d2, c) = predColumn(df, p)
            df = d2
            (c, go(t0, num))
          }
          val base: Column = e.map(go(_, num)).getOrElse(lit(null))
          compiled.foldRight(base) { case ((c, tc), acc) => when(c, tc).otherwise(acc) }
        case ArithT(o, a, b) => o match {
          case "+" => go(a, num) + go(b, num)
          case "-" => go(a, num) - go(b, num)
          case "*" => go(a, num) * go(b, num)
          case "/" => go(a, num) / go(b, num)
          case "%" => go(a, num) % go(b, num)
        }
      }
      val c = go(t, numeric)
      (df, c)
    }

    /** Predicate compilation over a frame (binding prop columns as
      * needed); returns the filtered frame. A bare identifier condition
      * (no `.prop`) references a column directly — a WITH alias. */
    def applyPred(df0: DataFrame, p: Pred): DataFrame = {
      val (df, cond) = predColumn(df0, p)
      df.filter(cond).drop(df.columns.filter(c =>
        c.startsWith("__exists") || c.startsWith("__psize")): _*)
    }

    /** Session-unique suffix for exists-flag columns (predColumn can
      * recurse through CASE terms — a local counter would collide). */
    private var existsSeq = 0

    /** Session-unique suffix for size(<pattern>) count columns. */
    private var sizeSeq = 0

    /** Compile a predicate to a boolean Column over a frame, binding
      * prop columns / exists-flag joins as needed; returns the updated
      * frame and the condition. Any appended `__exists*` helper columns
      * are dropped by [[applyPred]] after the filter (harmless
      * elsewhere — projections never select them). */
    private def predColumn(df0: DataFrame, p: Pred): (DataFrame, Column) = {
      var df = df0
      def compile(p: Pred): Column = p match {
        case Leaf(c) =>
          val cn = c.prop match {
            case Some(pr) =>
              val (df2, n) = bindProp(df, c.v, pr)
              df = df2
              n
            case None =>
              require(df.columns.contains(c.v), s"unbound identifier '${c.v}'")
              c.v
          }
          val raw = col(cn)
          if (c.numeric) {
            val lhs = raw.cast("double")
            c.op match {
              case "=" => lhs === c.value.toDouble
              case "<>" => lhs =!= c.value.toDouble
              case ">" => lhs > c.value.toDouble
              case ">=" => lhs >= c.value.toDouble
              case "<" => lhs < c.value.toDouble
              case "<=" => lhs <= c.value.toDouble
              case op => throw new IllegalArgumentException(s"$op with a numeric literal")
            }
          } else c.op match {
            case "=" => raw === c.value
            case "<>" => raw =!= c.value
            case "CONTAINS" => raw.contains(c.value)
            case "STARTS WITH" => raw.startsWith(c.value)
            case "ENDS WITH" => raw.endsWith(c.value)
            case op => throw new IllegalArgumentException(s"$op needs a numeric literal")
          }
        case CmpLeaf(l, "=~", r) =>
          // Cypher's =~ matches the WHOLE string (unlike SQL rlike's
          // substring find) — anchor the pattern
          val pat = r match {
            case StrT(p0) => p0
            case _ => throw new IllegalArgumentException("=~ needs a 'string' literal pattern")
          }
          val (d1, lc) = compileTerm(df, l, numeric = false)
          df = d1
          lc.rlike(s"^(?:$pat)$$")
        case InPred(l, ListT(ts)) =>
          // literal list: compile to isin (codegen'd); numeric when every
          // element is numeric (same typing switch as comparisons)
          val vals: Seq[Any] = ts.map {
            case NumT(x) => x
            case StrT(s0) => s0
            case other => throw new IllegalArgumentException(
              s"IN list elements must be literals, got $other")
          }
          val numeric = ts.nonEmpty && ts.forall(_.isInstanceOf[NumT])
          val (d1, lc) = compileTerm(df, l, numeric)
          df = d1
          if (vals.isEmpty) lit(false) else lc.isin(vals: _*)
        case InPred(l, r) =>
          // list-column membership (`x IN ips` over a collect alias)
          val (d1, lc) = compileTerm(df, l, numeric = false)
          df = d1
          val (d2, rc) = compileTerm(df, r, numeric = false)
          df = d2
          array_contains(rc, lc)
        case QuantPred(q, qv, src, w) =>
          // any/all/none/single(x IN xs WHERE p) → exists()/forall()
          val (d1, srcC) = compileTerm(df, src, numeric = false)
          df = d1
          val bt = dfElemType(df, srcC).map(et => Map(qv -> et)).getOrElse(Map.empty)
          val outer = (t2: Term, n2: Boolean) => {
            val (d2, c2) = compileTerm(df, t2, n2)
            df = d2
            c2
          }
          val lam = (xx: Column) => lambdaPred(w, Map(qv -> xx), outer, bt)
          q match {
            case "any" => exists(srcC, lam)
            case "all" => forall(srcC, lam)
            case "none" => !exists(srcC, lam)
            case "single" => size(filter(srcC, lam)) === 1
          }
        case CmpLeaf(l, op, r) =>
          // any numeric term (literal, arithmetic, coercion) switches the
          // whole comparison to double; otherwise refs compare as the
          // stored strings (same typing rule as the aggregate family)
          val numeric = isNumericTerm(l) || isNumericTerm(r)
          val (d1, lc) = compileTerm(df, l, numeric)
          df = d1
          val (d2, rc) = compileTerm(df, r, numeric)
          df = d2
          op match {
            case "=" => lc === rc
            case "<>" => lc =!= rc
            case ">" => lc > rc
            case ">=" => lc >= rc
            case "<" => lc < rc
            case "<=" => lc <= rc
            case "CONTAINS" => lc.contains(rc)
            case "STARTS WITH" => lc.startsWith(rc)
            case "ENDS WITH" => lc.endsWith(rc)
          }
        case NullLeaf(t, isNull) =>
          val (d2, c) = compileTerm(df, t, numeric = false)
          df = d2
          if (isNull) c.isNull else c.isNotNull
        case Not(p0) => !compile(p0)
        case ExistsPat((np, hops), anchor, innerWhere) =>
          // existential semi-match as a COLUMN (so it composes under
          // NOT/OR): walk the pattern from the distinct anchor values,
          // filter with the inner WHERE (over pattern variables),
          // left-join a presence flag back. Catalyst rewrites the
          // filtered left join to a semi/anti join where applicable.
          require(df.columns.contains(anchor),
            s"exists() pattern must start at a bound variable, got '$anchor'")
          existsSeq += 1
          val flag = s"__exists$existsSeq"
          var matches = walk(
            applyNodeFilter(df.select(col(anchor)).distinct(), np.head, anchor),
            np, hops)
          innerWhere.foreach { p => matches = applyPred(matches, p) }
          val sub = matches
            .select(col(anchor)).distinct()
            .withColumn(flag, lit(true))
          df = df.join(sub, Seq(anchor), "left")
          coalesce(col(flag), lit(false))
        case LabelPred(v, le) =>
          // membership of the row's value in the label expression's
          // node-id set, as a flag-joined COLUMN (composes under
          // NOT/OR like ExistsPat); a single positive label reuses the
          // same shape — one labeled scan, one equi-join
          require(df.columns.contains(v), s"unbound identifier '$v'")
          existsSeq += 1
          val flag = s"__exists$existsSeq"
          val ids =
            if (le.exists(c => c == '|' || c == '&' || c == '!')) labelExprIds(le)
            else nodes.filter(col("label") === le).select(col("id"))
          val sub = ids.distinct().select(col("id").as(v))
            .withColumn(flag, lit(true))
          df = df.join(sub, Seq(v), "left")
          coalesce(col(flag), lit(false))
        case And(ps) => ps.map(compile).reduce(_ && _)
        case Or(ps) => ps.map(compile).reduce(_ || _)
      }
      val cond = compile(p)
      (df, cond)
    }

    /** Project RETURN/WITH items, with Cypher's implicit grouping when
      * aggregates appear. */
    def project(bound0: DataFrame, items: Seq[RetItem], distinct: Boolean): DataFrame = {
      var bound = bound0
      // path-accessor items on GENERIC path bindings are plain columns
      // (and grouping keys under implicit grouping), not aggregates —
      // the shortestPath route keeps its own handling
      def isPathAcc(it: RetItem): Boolean =
        it.agg.exists(a => a == "nodes" || a == "relationships" || a == "length") &&
          it.prop.isEmpty && pathBinds.contains(it.v)
      val (aggItems, plainItems) =
        items.partition(it => it.agg.isDefined && !isPathAcc(it))
      val plainCols = plainItems.map { it =>
        if (isPathAcc(it)) pathAccessor(it.v, it.agg.get).as(it.outName)
        else it.term match {
          case Some(t) =>
            val (df2, c) = compileTerm(bound, t, isNumericTerm(t))
            bound = df2
            c.as(it.outName)
          case None => it.prop match {
            case None if it.agg.isEmpty && pathBinds.contains(it.v) &&
                !bound.columns.contains(it.v) =>
              // bare `p` on a generic path binding: render the
              // '>'-joined node sequence, the shortestPath path format
              concat_ws(">", pathAccessor(it.v, "nodes")).as(it.outName)
            case None =>
              require(bound.columns.contains(it.v), s"unbound variable '${it.v}'")
              if (it.outName == it.v) col(it.v) else col(it.v).as(it.outName)
            case Some(p) =>
              val (df2, cn) = bindProp(bound, it.v, p)
              bound = df2
              if (cn == it.outName) col(cn) else col(cn).as(it.outName)
          }
        }
      }
      val aggCols = aggItems.map { it =>
        def valueCol(): Column = it.term match {
          case Some(t) =>
            val (df2, c) = compileTerm(bound, t, isNumericTerm(t))
            bound = df2
            c
          case None =>
            val raw = it.prop match {
              case None =>
                require(bound.columns.contains(it.v), s"unbound variable '${it.v}'")
                col(it.v)
              case Some(p) =>
                val (df2, cn) = bindProp(bound, it.v, p)
                bound = df2
                col(cn)
            }
            it.cast match {
              case Some("tointeger") => raw.cast("long")
              case Some("tofloat") => raw.cast("double")
              case _ => raw
            }
        }
        (it.agg.get match {
          case "count" =>
            if (it.v == "*") count(lit(1))
            else if (it.adistinct) count_distinct(valueCol()) else count(valueCol())
          case "sum" =>
            if (it.adistinct) sum_distinct(valueCol().cast("double"))
            else sum(valueCol().cast("double"))
          case "avg" => avg(valueCol().cast("double"))
          // DISTINCT is a no-op under min/max — accepted for Cypher parity
          case "min" => min(valueCol())
          case "max" => max(valueCol())
          case "collect" =>
            array_sort(if (it.adistinct) collect_set(valueCol()) else collect_list(valueCol()))
          case "stdev" => stddev_samp(valueCol().cast("double"))
          case "stdevp" => stddev_pop(valueCol().cast("double"))
          // percentileCont: linear interpolation (Spark's exact
          // percentile matches Neo4j's continuous definition; buffer is
          // O(distinct values) — the value→count map form);
          // percentileDisc: Neo4j's nearest-rank — the stored value at
          // 1-indexed position ceil(p·n) of the sorted group (min for
          // p = 0). Sort-based, O(group) agg buffer — same shape as
          // collect(); NOT percentile_approx at max accuracy, whose
          // QuantileSummaries buffer grows with accuracy and whose
          // rounding can miss the nearest-rank value on even-count ties
          case "percentilecont" =>
            percentile(valueCol().cast("double"), lit(it.aggArg.get))
          case "percentiledisc" => {
            val lst = array_sort(collect_list(valueCol().cast("double")))
            // try_: an all-null group collects an empty list → null
            // (like percentile/avg), not an ANSI index error.
            // The 1e-9 nudge keeps exact-integer ranks exact: p·n that
            // is mathematically integral can overshoot in doubles
            // (0.07·100 = 7.000000000000001 → ceil 8) — subtracting a
            // sub-rank epsilon before ceil lands on the true rank for
            // any group under ~1e9 rows
            try_element_at(lst,
              greatest(lit(1),
                ceil(lit(it.aggArg.get) * size(lst) - lit(1e-9)).cast("int")))
          }
          case "length" | "nodes" | "relationships" => throw new IllegalArgumentException(
            s"${it.agg.get}() needs a path variable (shortestPath or a " +
              "`MATCH p = <chain>` binding)")
          case a => throw new IllegalArgumentException(s"unsupported aggregate: $a")
        }).as(it.outName)
      }
      var out =
        if (aggCols.nonEmpty && plainCols.isEmpty) {
          // GLOBAL aggregation (`RETURN count(*)` with no grouping
          // item) — one row, even over an empty input, with Cypher's
          // empty-input values: count = 0 (Spark's already), sum = 0
          // (Spark gives null — fill), collect = [] (Spark's already);
          // avg/min/max stay null, like Cypher
          var g = bound.agg(aggCols.head, aggCols.tail: _*)
          aggItems.filter(_.agg.contains("sum")).foreach { it =>
            g = g.withColumn(it.outName, coalesce(col(it.outName), lit(0.0)))
          }
          g
        } else if (aggCols.nonEmpty) {
          // group on the OUTPUT columns (plain items may be aliases)
          bound.select((plainCols ++ bound.columns.filterNot(c =>
              plainItems.exists(_.outName == c)).map(col)).distinct: _*)
            .groupBy(plainItems.map(it => col(it.outName)): _*)
            .agg(aggCols.head, aggCols.tail: _*)
        } else bound.select(plainCols: _*)
      if (distinct && aggCols.isEmpty) out = out.distinct()
      out
    }

    /** `MATCH p = shortestPath((a)-[:T*]->(b))` — compiled to a BFS
      * with materialized paths from the pinned source. The source must
      * be pinned with an `a.id = '…'` conjunct in WHERE (per-pair all-
      * sources shortest path would need one BFS per source — out of
      * scope); remaining conjuncts filter the reached side. */
    def runShortestPath(q: Query, sp: ShortestPat): DataFrame = {
      val conjuncts: Seq[Pred] = q.stage.where.toSeq.flatMap {
        case And(ps) => ps
        case p => Seq(p)
      }
      val (seedConds, rest) = conjuncts.partition {
        case Leaf(c) => c.v == sp.a.v && c.prop.contains("id") && c.op == "=" && !c.numeric
        case _ => false
      }
      val h = sp.hop
      val e1 = edgesOfType(h.etype)
      val e0 = propsCond(h.props).map(e1.filter).getOrElse(e1)
      val e = if (h.reverse) e0.select(col("dst").as("src"), col("src").as("dst"))
              else e0.select(col("src"), col("dst"))
      var out =
        if (seedConds.nonEmpty) {
          // pinned source — one single-source BFS
          val seedId = seedConds.head.asInstanceOf[Leaf].c.value
          // source label/props check (pinned node must satisfy them,
          // else the match is empty)
          val seedOk = (sp.a.label.isEmpty && sp.a.props.isEmpty) ||
            nodeFilterIds(sp.a).get.filter(col("id") === seedId).limit(1).count() == 1
          val spark = nodes.sparkSession
          import spark.implicits._
          val seed = Seq(seedId).toDF("id")
          val paths =
            if (sp.all) GraphOps.bfsAllPathsFrom(e, seed, maxIter = h.max).drop("root")
            else GraphOps.bfsPaths(e, seed, maxIter = h.max)
          val r = paths
            .filter(col("dist") >= h.min && col("dist") <= h.max)
            .withColumnRenamed("id", sp.b.v)
            .withColumnRenamed("path", sp.pathVar)
            .withColumn(sp.a.v, lit(seedId))
          if (seedOk) r else r.limit(0)
        } else {
          // unpinned — ALL-PAIRS shortest paths from every node matching
          // a's label, as ONE multi-source keyed BFS (never a per-root
          // loop); the reached-pair space is the same bounded transitive
          // closure a variable-length hop materializes.
          // allShortestPaths keeps every tied path per pair.
          val from = seedOf(sp.a).select(col(sp.a.v).as("id"))
          (if (sp.all) GraphOps.bfsAllPathsFrom(e, from, maxIter = h.max)
           else GraphOps.bfsPathsFrom(e, from, maxIter = h.max))
            .filter(col("dist") >= h.min && col("dist") <= h.max)
            .withColumnRenamed("root", sp.a.v)
            .withColumnRenamed("id", sp.b.v)
            .withColumnRenamed("path", sp.pathVar)
        }
      out = applyNodeFilter(out, sp.b, sp.b.v)
      rest.foreach { p => out = applyPred(out, p) }
      val cols = q.ret.map { it =>
        (it.agg, it.v, it.prop) match {
          case (Some("length"), v, None) if v == sp.pathVar =>
            col("dist").cast("long").as(if (it.alias.isDefined) it.outName else s"length_$v")
          case (Some("nodes"), v, None) if v == sp.pathVar =>
            // the '>'-joined path string IS the node-id sequence
            split(col(sp.pathVar), ">").as(it.outName)
          case (Some("relationships"), v, None) if v == sp.pathVar =>
            // one "src-[TYPE]->dst" per traversed step (the hop's etype
            // is the pattern's; an untyped hop renders -[]->). Paths are
            // hop-bounded (≤ 10), so the per-element re-split is cheap
            val ns = split(col(sp.pathVar), ">")
            val t = sp.hop.etype.getOrElse("")
            require(!t.contains("|"),
              "relationships(p) on a type-disjunction shortestPath hop is " +
                "unsupported (the BFS path carries node ids only, so the " +
                "per-step type cannot be reconstructed)")
            when(size(ns) >= 2,
              transform(sequence(lit(1), size(ns) - 1),
                i => concat(element_at(ns, i), lit(s"-[$t]->"), element_at(ns, i + 1))))
              .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
              .as(it.outName)
          case (None, v, None) =>
            require(out.columns.contains(v), s"unbound variable '$v'")
            if (it.outName == v) col(v) else col(v).as(it.outName)
          case (None, v, Some(p)) =>
            val (df2, cn) = bindProp(out, v, p)
            out = df2
            if (cn == it.outName) col(cn) else col(cn).as(it.outName)
          case _ => throw new IllegalArgumentException(
            s"aggregates not supported with shortestPath: ${it.outName}")
        }
      }
      var res = out.select(cols: _*)
      if (q.distinct) res = res.distinct()
      if (q.orderBy.nonEmpty)
        res = res.orderBy(sortCols(q.orderBy): _*)
      q.skip.foreach(n => res = res.offset(n))
      q.limit.foreach(n => res = res.limit(n))
      res
    }
  }
}
