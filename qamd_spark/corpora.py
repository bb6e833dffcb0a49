"""Embedded, frozen seed corpora for the hashed char-n-gram models.

The reference pipeline family uses fastText lid.176 for language ID and a
KenLM-style n-gram LM for perplexity (BASELINE.json north_star). Neither
model artifact is available offline in this sandbox, so we ship a small
deterministic substitute: per-language character-trigram tables built at
import time from the frozen text below. The text is original generic prose
(written for this repo); determinism is the requirement, not linguistic
coverage — the synthetic test corpus is drawn from the same style family.

Do NOT edit casually: the tables derived from these strings define the
reference labels (oracle output) bit-for-bit.
"""

EN = """
the quick brown fox jumps over the lazy dog while the sun sets behind the
hills and the river keeps flowing toward the quiet sea. every morning the
baker opens the shop and the smell of fresh bread drifts across the square.
children walk to school along the old stone road and talk about the games
they will play in the afternoon. the library on the corner keeps a small
collection of maps and letters from a century ago. when the rain comes the
streets empty quickly and people gather under the awnings to wait. a good
cup of tea and a long book make the slow evenings feel shorter. the train
leaves the station at seven and arrives in the city just before nine. we
measured the results carefully and wrote down every number in the ledger.
the committee will meet on tuesday to review the budget and plan the next
quarter. history teaches patience and the garden teaches it twice. please
remember to close the gate so the sheep do not wander onto the road. the
engineer checked the bridge again because the winter had been hard on the
steel. most of the answers were simple once the question was stated well.
"""

FR = """
le petit matin se lève sur la ville et les rues sentent le pain chaud et le
café. les enfants marchent vers l'école en parlant des jeux de l'après-midi.
la bibliothèque du quartier garde une collection de cartes et de lettres du
siècle dernier. quand la pluie arrive les gens s'abritent sous les arcades
et attendent en regardant le ciel. une tasse de thé et un long livre rendent
les soirées plus douces. le train part de la gare à sept heures et arrive en
ville juste avant neuf heures. nous avons mesuré les résultats avec soin et
noté chaque nombre dans le registre. le comité se réunira mardi pour revoir
le budget et préparer le prochain trimestre. l'histoire enseigne la patience
et le jardin l'enseigne deux fois. n'oubliez pas de fermer la barrière pour
que les moutons ne sortent pas sur la route. l'ingénieur a vérifié le pont
encore une fois parce que l'hiver avait été dur pour l'acier. la plupart des
réponses étaient simples une fois la question bien posée.
"""

DE = """
der frühe morgen liegt über der stadt und die straßen riechen nach frischem
brot und kaffee. die kinder gehen zur schule und sprechen über die spiele
des nachmittags. die bibliothek an der ecke bewahrt eine kleine sammlung von
karten und briefen aus dem letzten jahrhundert. wenn der regen kommt leeren
sich die straßen schnell und die leute warten unter den vordächern. eine
tasse tee und ein langes buch machen die langsamen abende kürzer. der zug
verlässt den bahnhof um sieben und kommt kurz vor neun in der stadt an. wir
haben die ergebnisse sorgfältig gemessen und jede zahl in das buch
geschrieben. der ausschuss trifft sich am dienstag um das budget zu prüfen
und das nächste quartal zu planen. die geschichte lehrt geduld und der
garten lehrt sie zweimal. bitte denkt daran das tor zu schließen damit die
schafe nicht auf die straße laufen. der ingenieur prüfte die brücke noch
einmal weil der winter hart für den stahl gewesen war. die meisten antworten
waren einfach sobald die frage gut gestellt war.
"""

ES = """
la mañana temprana cubre la ciudad y las calles huelen a pan recién hecho y
a café. los niños caminan hacia la escuela hablando de los juegos de la
tarde. la biblioteca de la esquina guarda una pequeña colección de mapas y
cartas del siglo pasado. cuando llega la lluvia las calles se vacían rápido
y la gente espera bajo los toldos mirando el cielo. una taza de té y un
libro largo hacen más cortas las tardes lentas. el tren sale de la estación
a las siete y llega a la ciudad justo antes de las nueve. medimos los
resultados con cuidado y anotamos cada número en el registro. el comité se
reunirá el martes para revisar el presupuesto y planear el próximo
trimestre. la historia enseña paciencia y el jardín la enseña dos veces. por
favor recuerden cerrar la puerta para que las ovejas no salgan al camino. el
ingeniero revisó el puente otra vez porque el invierno había sido duro para
el acero. la mayoría de las respuestas eran simples una vez que la pregunta
estaba bien planteada.
"""

LANG_CORPORA = {"en": EN, "fr": FR, "de": DE, "es": ES}

# English stopword lexicon (broadcast side input; analogue of the
# reference's test/stopwords.txt mechanism, reference
# src/check/dictionary.rs:22-24). Frozen.
STOPWORDS = (
    "a an and are as at be but by for from has have he her his i in is it "
    "its of on or she that the their them they this to was were will with "
    "you your we our not no so if then than do does did what which who"
).split()

# Synthetic profanity lexicon (toxicity side input; planted pseudo-words so
# tests contain no real slurs — FIXTURES.md §2).
PROFANITY = ["fraktz", "blorgak", "smegwit", "drekhole"]
