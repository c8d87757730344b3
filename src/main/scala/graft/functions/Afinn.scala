package graft.functions

/** Word-valence lexicons for the sentiment operators (F8/F9).
  *
  * `afinn` is a subset of the public AFINN-111 lexicon (Finn Årup
  * Nielsen, 2011, ODbL) — integer valences in [-5, 5] — covering the
  * common English sentiment words; the operator accepts any
  * word->valence map, so a deployment can drop in the full 2477-entry
  * file. `domain` is the lexicon used for the oracle-checked corpus
  * queries: the synthetic documents' vocabulary is database jargon, so a
  * small domain lexicon keeps the check non-vacuous.
  */
object Afinn {

  val afinn: Map[String, Int] = Map(
    "abandon" -> -2, "abuse" -> -3, "admire" -> 3, "adore" -> 3,
    "afraid" -> -2, "aggressive" -> -2, "amazing" -> 4, "anger" -> -3,
    "angry" -> -3, "annoy" -> -2, "anxious" -> -2, "appease" -> 2,
    "appreciate" -> 2, "attack" -> -1, "award" -> 3, "awesome" -> 4,
    "awful" -> -3, "bad" -> -3, "beautiful" -> 3, "benefit" -> 2,
    "best" -> 3, "better" -> 2, "bless" -> 2, "bore" -> -2,
    "boring" -> -3, "brave" -> 2, "breathtaking" -> 5, "bright" -> 1,
    "brilliant" -> 4, "broken" -> -1, "calm" -> 2, "care" -> 2,
    "catastrophic" -> -4, "charm" -> 3, "cheer" -> 2, "clean" -> 2,
    "clever" -> 2, "comfort" -> 2, "cool" -> 1, "crash" -> -2,
    "crazy" -> -2, "cruel" -> -3, "cry" -> -1, "damage" -> -3,
    "danger" -> -2, "dark" -> -1, "dead" -> -3, "death" -> -2,
    "defeat" -> -2, "delight" -> 3, "despair" -> -3, "destroy" -> -3,
    "die" -> -3, "dirty" -> -2, "disaster" -> -2, "dream" -> 1,
    "drop" -> -1, "easy" -> 1, "enjoy" -> 2, "evil" -> -3,
    "excellent" -> 3, "excite" -> 3, "fail" -> -2, "failure" -> -2,
    "fake" -> -3, "fantastic" -> 4, "fear" -> -2, "fine" -> 2,
    "fool" -> -2, "forgive" -> 1, "free" -> 1, "fresh" -> 1,
    "friend" -> 1, "fun" -> 4, "funny" -> 4, "glad" -> 3,
    "gloom" -> -1, "good" -> 3, "grace" -> 1, "grand" -> 3,
    "great" -> 3, "grief" -> -2, "guilt" -> -3, "happy" -> 3,
    "hate" -> -3, "heaven" -> 2, "hell" -> -4, "help" -> 2,
    "hero" -> 2, "hope" -> 2, "hurt" -> -2, "ignore" -> -1,
    "joy" -> 3, "kill" -> -3, "kind" -> 2, "laugh" -> 1,
    "lie" -> -1, "like" -> 2, "lonely" -> -2, "lose" -> -3,
    "loss" -> -3, "love" -> 3, "loved" -> 3, "lucky" -> 3,
    "mad" -> -3, "miss" -> -2, "mistake" -> -2, "nice" -> 3,
    "pain" -> -2, "peace" -> 2, "perfect" -> 3, "please" -> 1,
    "poor" -> -2, "pretty" -> 1, "proud" -> 2, "rich" -> 2,
    "sad" -> -2, "safe" -> 1, "scare" -> -2, "shame" -> -2,
    "smile" -> 2, "sorry" -> -1, "strong" -> 2, "stupid" -> -2,
    "sweet" -> 2, "terrible" -> -3, "thank" -> 2, "tired" -> -2,
    "tragedy" -> -2, "trouble" -> -2, "true" -> 2, "trust" -> 1,
    "ugly" -> -3, "unhappy" -> -2, "war" -> -2, "warm" -> 1,
    "weak" -> -2, "win" -> 4, "wonderful" -> 4, "worry" -> -3,
    "worse" -> -3, "worst" -> -3, "wrong" -> -2, "young" -> 1)

  /** Valences for the synthetic corpus's database-jargon vocabulary. */
  val domain: Map[String, Int] = Map(
    "fast" -> 2, "slow" -> -2, "big" -> 1, "small" -> -1,
    "dup" -> -2, "merge" -> 1, "spark" -> 3, "scan" -> -1,
    "hash" -> 1, "stream" -> 2)

  /** The domain lexicon as inline SQL VALUES for the DuckDB oracle. */
  val domainSql: String = domain.toSeq.sorted
    .map { case (w, v) => s"('$w', $v)" }.mkString("(VALUES ", ", ", ")")
}
